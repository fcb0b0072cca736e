"""Interval algebra: merge overlapping/touching intervals per key
(gaps-and-islands) — the coverage/uptime/activity-span operator class.

Spark has no interval-merge primitive; this is the classic two-window
formulation: order intervals by start, open a new island whenever a start
exceeds the running max of all previous ends, then the island id is the
running sum of those break flags. Both windows share one (key, start, end)
sort — a single shuffle on the key columns, state per partition is one
running max + one counter.

All comparisons run on microsecond integers (``unix_micros``), never on
seconds-granularity casts or doubles — exactly reproducible in a DuckDB
oracle via ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce per-key intervals [start, end) that overlap or touch
    (``start <= previous running max end`` joins the island; strictly
    greater opens a new one — so [1,3) and [3,5) merge into [1,5)).

    Returns one row per island: key columns + ``island_start``,
    ``island_end`` (timestamps), ``n_intervals``.
    """
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    w = Window.partitionBy(*key_cols).orderBy(s_us, e_us)
    prev_max_end = F.max(e_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_break = (prev_max_end.isNull() | (s_us > prev_max_end)).cast("long")
    island = F.sum(is_break).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            *key_cols,
            s_us.alias("_s"),
            e_us.alias("_e"),
            island.alias("_island"),
        )
        .groupBy(*key_cols, "_island")
        .agg(
            F.timestamp_micros(F.min("_s")).alias("island_start"),
            F.timestamp_micros(F.max("_e")).alias("island_end"),
            F.count("*").alias("n_intervals"),
        )
        .drop("_island")
    )


def coverage_stats(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key coverage summary over the merged islands: island count,
    total covered seconds (sum of island lengths — overlaps counted once),
    and the longest island's seconds. Integer seconds (microsecond math,
    DIV 1_000_000) so the result is engine-exact."""
    islands = merge_intervals(df, key_cols, start_col, end_col)
    length_us = F.unix_micros(F.col("island_end")) - F.unix_micros(
        F.col("island_start")
    )
    return (
        islands.groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(length_us).alias("_cov_us"),
            F.max(length_us).alias("_max_us"),
        )
        .select(
            *key_cols,
            "n_islands",
            # integer DIV, not float division: exact at any magnitude and
            # identical to the oracle's `//`
            F.expr("_cov_us DIV 1000000").alias("coverage_sec"),
            F.expr("_max_us DIV 1000000").alias("max_island_sec"),
        )
    )
