"""Hypertable-style time-series operators: time_bucket rollup + gapfill.

TimescaleDB/QuestDB-class engines special-case these (``time_bucket_gapfill``
+ ``locf()``/``interpolate()``); Spark has neither a gapfill nor an
interpolation primitive, so this module composes them from built-in
DataFrame ops — generated time grids, left joins, and windowed
carry-forward. The reference engine has no time-series surface at all
(single-table SELECT only, pkg/handlers/select.go:49-54); this belongs to
the beyond-reference tier (SURVEY.md §2.8).

Scale design (100 TB posture):
- ``time_bucket`` is pure integer Column algebra on ``unix_micros`` — stays
  inside whole-stage codegen, exactly reproducible in the DuckDB oracle
  (``time_bucket`` floors to the epoch the same way).
- ``rollup`` is one partial-aggregated shuffle on (keys, bucket) — the same
  cost as any groupBy; AQE splits skewed keys.
- The gapfill grid is GENERATED (distinct keys × ``sequence()`` explode),
  never shuffled out of the fact table: distinct-keys is a partial-agg
  shuffle over the tiny key domain, bounds is a 1-row global agg that
  broadcast-joins onto it, and the explode fans each key row into its slots
  in place. Keys are repartitioned before the explode so one task per key
  (not one task total) expands the grid.
- Grid size is keys × slots — independent of fact-table row count. A year
  of 1-minute slots × 10k keys is 5.3e9 grid rows: big but bounded, and it
  shuffles once (the left join against the rolled-up aggregates, which are
  the same size or smaller).
- LOCF / linear interpolation are single window passes per key ordered by
  slot — state per partition is one running value, not buffered rows.
  Forward- and backward-looking windows over the same (keys, slot) ordering
  reuse one sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_US = 1_000_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def time_bucket(ts: Column | str, every_seconds: int) -> Column:
    """Floor a timestamp to an epoch-aligned ``every_seconds`` bucket —
    the TimescaleDB/DuckDB ``time_bucket(INTERVAL, ts)`` contract.

    Integer microsecond arithmetic (no double round-trip): ``pmod`` (not
    ``%``) so pre-epoch timestamps still floor toward -inf, matching
    DuckDB's flooring."""
    us = F.unix_micros(_c(ts))
    e = F.lit(int(every_seconds) * _US)
    return F.timestamp_micros((us - F.pmod(us, e)).cast("long"))


def rollup(
    df: DataFrame,
    ts_col: str,
    every_seconds: int,
    keys: list[str],
    aggs: list[Column],
    bucket_alias: str = "slot",
) -> DataFrame:
    """Bucketed aggregate: ``GROUP BY keys, time_bucket(ts)``. One shuffle,
    map-side partial agg."""
    b = time_bucket(ts_col, every_seconds).alias(bucket_alias)
    return df.groupBy(*[F.col(k) for k in keys], b).agg(*aggs)


def dense_grid(
    rolled: DataFrame,
    bucket_col: str,
    keys: list[str],
    every_seconds: int,
) -> DataFrame:
    """Full (key × slot) grid spanning the GLOBAL [min, max] bucket range
    of ``rolled`` — one row per key per slot, observed or not.

    The global range (rather than per-key ranges) is deliberate: gapfilled
    series are usually compared/joined across keys, so every key gets the
    same time axis (the TimescaleDB ``time_bucket_gapfill(start, finish)``
    shape with the bounds inferred from the data)."""
    bounds = rolled.agg(
        F.min(bucket_col).alias("_g0"), F.max(bucket_col).alias("_g1")
    )
    key_rows = rolled.select(*keys).distinct()
    # Repartition the (small) key set so each key expands its slot sequence
    # on its own task — explode parallelism follows key-row placement.
    n_keys_part = max(1, rolled.sparkSession.sparkContext.defaultParallelism)
    return (
        key_rows.repartition(min(n_keys_part, 64), *keys)
        .join(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("_g0"),
                    F.col("_g1"),
                    F.expr(f"INTERVAL {int(every_seconds)} SECONDS"),
                )
            ).alias(bucket_col),
        )
    )


def gapfill(
    rolled: DataFrame,
    bucket_col: str,
    keys: list[str],
    value_cols: list[str],
    every_seconds: int,
    method: str = "locf",
    observed_alias: str = "observed",
) -> DataFrame:
    """Fill the missing (key, slot) cells of a rolled-up series.

    ``method``:
      - ``'null'``   — dense grid, absent cells stay NULL (plus the
        ``observed`` flag; TimescaleDB's plain ``time_bucket_gapfill``).
      - ``'locf'``   — last observation carried forward per key; slots
        before a key's first observation stay NULL (no back-fill).
      - ``'linear'`` — linear interpolation between the bracketing
        observations on the microsecond time axis; slots outside
        [first obs, last obs] stay NULL (no extrapolation — the
        TimescaleDB ``interpolate()`` contract).

    Returns keys + bucket + ``observed`` + one filled column per
    ``value_cols`` (same names)."""
    if method not in ("null", "locf", "linear"):
        raise ValueError(f"unknown gapfill method {method!r}")
    grid = dense_grid(rolled, bucket_col, keys, every_seconds)
    joined = grid.join(rolled, on=[*keys, bucket_col], how="left")
    # Observedness must key off a value column (the join key columns are
    # never NULL post-join): a cell is observed iff the rollup produced it.
    probe = F.col(value_cols[0])
    out = joined.withColumn(observed_alias, probe.isNotNull())

    if method == "null":
        return out

    w = Window.partitionBy(*keys).orderBy(bucket_col)
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if method == "locf":
        for v in value_cols:
            out = out.withColumn(v, F.last(F.col(v), ignorenulls=True).over(back))
        return out

    # linear: bracketing observation values AND times, per key and per
    # column (a secondary column may be NULL on a row where the first one
    # isn't). The forward window reuses the same (keys, slot) sort as the
    # backward one.
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t = F.unix_micros(F.col(bucket_col)).cast("double")
    for v in value_cols:
        vv = F.col(v)
        obs_t = F.when(vv.isNotNull(), t)  # NULL where this column has a gap
        prev_t = F.last(obs_t, ignorenulls=True).over(back)
        next_t = F.first(obs_t, ignorenulls=True).over(fwd)
        prev_v = F.last(vv, ignorenulls=True).over(back)
        next_v = F.first(vv, ignorenulls=True).over(fwd)
        frac = (t - prev_t) / (next_t - prev_t)
        out = out.withColumn(
            v, F.when(vv.isNotNull(), vv).otherwise(prev_v + (next_v - prev_v) * frac)
        )
    return out
