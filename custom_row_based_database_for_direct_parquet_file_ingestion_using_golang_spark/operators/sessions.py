"""Batch sessionization: gap-based session assignment over an event log.

The streaming side of this (``F.session_window``) lives in
``streaming/ops.py``; this is the batch equivalent for backfill over
historical data — the standard lag-diff + running-sum formulation, and the
batch/stream pair matches how the reference's event workloads split
(SURVEY.md §2.8).

Scale design: ONE shuffle (partition by user), then two window passes over
the same (user, ts) ordering — Spark reuses the single sort. State per
partition is a running counter, not buffered rows. Gap comparison runs on
microsecond integers (``unix_micros``), not seconds — second-granularity
casts truncate and mis-bucket sub-second gaps, and integer arithmetic is
exactly reproducible in the DuckDB oracle (``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``session_id``: 1-based per-user counter that increments when
    the gap to the previous event exceeds ``gap_seconds`` (strict >).

    ``tiebreak_cols`` must make the per-user ordering total (e.g. a unique
    event id) — without it, equal timestamps make lag() nondeterministic
    under shuffle-order changes.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    is_break = (
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > F.lit(int(gap_seconds) * 1_000_000))
    )
    return events.withColumn(
        "session_id",
        F.sum(is_break.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
