"""Column profiling: the DuckDB-``SUMMARIZE`` / Spark-`df.summary()` class
of operator, built for oracle-checkable exactness.

One long-format row per profiled column: row count, null count, distinct
count, numeric min/max/mean, and string/temporal min/max. Everything is a
single global aggregate — no per-column jobs, no driver loops; Spark plans
the multi-distinct aggregate as one Expand + partial-agg pass (data is
replicated once per distinct column — the standard cost; pass
``exact_distinct=False`` to profile with HLL++ ``approx_count_distinct``
in a single non-expanded pass, the right default at 100 TB).

The reference has no profiling surface (DESCRIBE lists declared types
only); this extends the maintenance/inspection tier the same way DESCRIBE
and EXPLAIN did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
_STRINGY = (StringType, DateType, TimestampType, TimestampNTZType)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, mean,
    min_str, max_str).

    Numeric columns fill the ``*_num``/``mean`` fields (mean summed in
    DECIMAL so it is shuffle-order-free — reproducible across engines and
    re-runs); string/date/timestamp columns fill ``min_str``/``max_str``
    (temporal values cast to their canonical string form). Other types
    (arrays, structs, binary) profile counts only.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"profile: no such column(s) {unknown}")

    aggs: list = [F.count(F.lit(1)).alias("_nrows")]
    for c in cols:
        t = fields[c]
        aggs.append(F.count(F.col(c)).alias(f"_cnt_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if isinstance(t, _NUMERIC):
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"_min_{c}"),
                F.max(F.col(c)).cast("double").alias(f"_max_{c}"),
                F.sum(F.col(c).cast("decimal(38,9)")).cast("double").alias(
                    f"_sum_{c}"
                ),
            ]
        elif isinstance(t, _STRINGY):
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"_smin_{c}"),
                F.max(F.col(c)).cast("string").alias(f"_smax_{c}"),
            ]
    one = df.agg(*aggs)

    def _row(c: str):
        t = fields[c]
        num = isinstance(t, _NUMERIC)
        stringy = isinstance(t, _STRINGY)
        return F.struct(
            F.lit(c).alias("column"),
            F.col("_nrows").alias("n_rows"),
            (F.col("_nrows") - F.col(f"_cnt_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if num else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"_max_{c}") if num else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (
                F.col(f"_sum_{c}") / F.col(f"_cnt_{c}")
                if num
                else F.lit(None).cast("double")
            ).alias("mean"),
            (F.col(f"_smin_{c}") if stringy else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.col(f"_smax_{c}") if stringy else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )

    return one.select(
        F.explode(F.array(*[_row(c) for c in cols])).alias("p")
    ).select("p.*")


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over numeric columns: one row per
    unordered pair (col_x, col_y, n, corr), computed in ONE aggregate job.

    Determinism: the five sufficient statistics per pair (Σx, Σy, Σx²,
    Σy², Σxy over the pairwise-complete rows) are summed in
    DECIMAL(38,12) — order-free, so the result is identical across
    partitionings and engines; the closed-form
    ``(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂) · √(n·Σy² − Σy²̂))`` then runs in
    doubles with a fixed operation order a SQL oracle can mirror exactly.
    Zero-variance pairs yield NULL (never ±inf). ``F.corr`` would be one
    reduce too — but its float accumulation order is partition-dependent,
    which is exactly what the decimal path removes."""
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    dec = "decimal(38,12)"
    aggs = []
    for k, (x, y) in enumerate(pairs):
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        vx = F.when(both, F.col(x).cast("double"))
        vy = F.when(both, F.col(y).cast("double"))
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"_n{k}"),
            F.sum(vx.cast(dec)).cast("double").alias(f"_sx{k}"),
            F.sum(vy.cast(dec)).cast("double").alias(f"_sy{k}"),
            F.sum((vx * vx).cast(dec)).cast("double").alias(f"_sxx{k}"),
            F.sum((vy * vy).cast(dec)).cast("double").alias(f"_syy{k}"),
            F.sum((vx * vy).cast(dec)).cast("double").alias(f"_sxy{k}"),
        ]
    one = df.agg(*aggs)

    def _row(k: int, x: str, y: str):
        n = F.col(f"_n{k}").cast("double")
        sx, sy = F.col(f"_sx{k}"), F.col(f"_sy{k}")
        sxx, syy, sxy = F.col(f"_sxx{k}"), F.col(f"_syy{k}"), F.col(f"_sxy{k}")
        num = n * sxy - sx * sy
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        return F.struct(
            F.lit(x).alias("col_x"),
            F.lit(y).alias("col_y"),
            F.col(f"_n{k}").alias("n"),
            F.when(den != 0, num / den).alias("corr"),
        )

    return one.select(
        F.explode(
            F.array(*[_row(k, x, y) for k, (x, y) in enumerate(pairs)])
        ).alias("p")
    ).select("p.*")


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one row per bucket —
    (bucket, lo, hi, n) — INCLUDING empty buckets (generated grid, so the
    output shape is fixed by ``bins``, not by the data).

    With explicit ``lo``/``hi`` the bucketing expression is pure row-local
    arithmetic on literals (codegen, one aggregate pass, exactly
    reproducible in a SQL oracle). When either bound is omitted it comes
    from a min/max aggregate first (an extra tiny job whose 1-row result is
    cross-joined in — still no driver collect in the data path... except
    the two bounds themselves, which are scalars by definition). Values at
    exactly ``hi`` fold into the last bucket (closed upper edge, the
    standard convention); values outside [lo, hi] are dropped.
    """
    if bins < 1:
        raise ValueError("histogram: bins must be >= 1")
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"histogram: need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    v = F.col(col).cast("double")
    bucket = F.least(
        F.lit(bins - 1), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    )
    counts = (
        df.filter((v >= lo) & (v <= hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    return (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
        .orderBy("bucket")
    )
