"""Shared operator utilities."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def double_array_sql(values) -> str | None:
    """SQL text of an ``array<double>`` literal, or None when any value is
    non-finite (no portable SQL spelling — callers fall back to per-element
    ``F.lit``). ``repr`` emits the shortest round-trip decimal (Java's
    parseDouble restores the exact double); the ``D`` suffix makes SQL type
    it DOUBLE, never DECIMAL."""
    vals = [float(v) for v in values]
    if any(not math.isfinite(v) for v in vals):
        return None
    return "array(" + ",".join(f"{v!r}D" for v in vals) + ")"


def lit_double_array(values) -> Column:
    """``array<double>`` literal built as ONE SQL-parsed expression.

    ``F.array(*[F.lit(v) for v in values])`` (and ``F.lit(list)``, which
    expands to it) pays one py4j round trip per element — measured ~1-2 ms
    each, i.e. ~0.5 s of driver time for a 512-weight model on every plan
    build (round-16, guide §1.2). One ``F.expr`` string parses JVM-side in
    ~1 ms. Non-finite values fall back to the per-element path."""
    vals = [float(v) for v in values]
    if not vals:
        return F.array().cast("array<double>")
    sql = double_array_sql(vals)
    if sql is None:
        return F.array(*[F.lit(v) for v in vals])
    return F.expr(sql)


def lit_long_array(values) -> Column:
    """``array<bigint>`` literal as ONE SQL-parsed expression (see
    :func:`lit_double_array`). CAST(… AS BIGINT) rather than an ``L``
    suffix so the full int64 range parses (−2⁶³ has no valid long-literal
    spelling — the parser sees unary minus around an overflowing 2⁶³)."""
    vals = [int(v) for v in values]
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr(
        "array(" + ",".join(f"CAST({v} AS BIGINT)" for v in vals) + ")"
    )


def ensure_parallelism(df: DataFrame, min_rows_per_partition: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default parallelism
    — but ONLY when the scan would otherwise under-parallelize.

    Why: Parquet scans split on row-group boundaries, so a small file written
    as a single row group yields ONE map task no matter what
    ``spark.sql.files.maxPartitionBytes`` says. For operators that do heavy
    per-row compute (MinHash signatures, SimHash bit sums, shingling,
    quality scoring), that serializes hundreds of ops/row onto one core.
    "Repartition before an expensive map" is the standard fix; the guard
    makes it a no-op at real scale, where a 100 TB table arrives with
    thousands of row groups and the extra shuffle would be the bug, not the
    fix.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
