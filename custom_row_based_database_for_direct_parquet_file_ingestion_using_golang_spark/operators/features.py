"""Feature-scaling operators for training-data pipelines.

The standard sklearn-preprocessing trio re-expressed as Spark column
algebra: one bounded per-group aggregate (the fitted "scaler state" — a
handful of doubles per group), broadcast back onto the rows, zero Python.
At 100 TB the aggregate is one shuffle bounded by the group count and the
apply stage is scan-local — the same fit/transform split sklearn makes,
with the fit output small enough to broadcast.

No reference equivalent (the reference has no numeric feature prep);
shapes follow sklearn's RobustScaler / StandardScaler / MinMaxScaler
documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _grouped(df: DataFrame, group_cols: list[str] | None, aggs) -> DataFrame:
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def _join_state(df: DataFrame, state: DataFrame, group_cols: list[str] | None) -> DataFrame:
    if group_cols:
        return df.join(F.broadcast(state), group_cols)
    return df.crossJoin(F.broadcast(state))


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "scaled",
    ndigits: int = 4,
) -> DataFrame:
    """RobustScaler: ``(x - median) / IQR`` per group — the outlier-proof
    normalization (median/quartiles move with the bulk, not the tails).
    Quantiles are EXACT interpolated (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``), so the fitted state replays cross-engine;
    delivered values round to ``ndigits`` (quantile interpolation carries
    ~1-ULP cross-engine noise — the known AVG/interp class). Groups where
    IQR = 0 scale to NULL (explicitly, not a divide-by-zero)."""
    v = F.col(value_col).cast("double")
    state = _grouped(
        df, group_cols,
        [
            F.percentile(v, F.lit(0.5)).alias("__med"),
            F.percentile(v, F.lit(0.75)).alias("__q3"),
            F.percentile(v, F.lit(0.25)).alias("__q1"),
        ],
    ).withColumn("__iqr", F.col("__q3") - F.col("__q1"))
    out = _join_state(df, state, group_cols)
    scaled = F.when(
        F.col("__iqr") > 0,
        F.round((v - F.col("__med")) / F.col("__iqr"), ndigits) + F.lit(0.0),
    )
    return out.withColumn(out_col, scaled).drop("__med", "__q1", "__q3", "__iqr")


def zscore_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "scaled",
    ndigits: int = 4,
) -> DataFrame:
    """StandardScaler: ``(x - mean) / stddev_samp`` per group. Sample
    stddev on both engines (Spark ``stddev`` ≡ DuckDB ``stddev``);
    single-row groups have NULL stddev and scale to NULL."""
    v = F.col(value_col).cast("double")
    state = _grouped(
        df, group_cols,
        [F.avg(v).alias("__mu"), F.stddev(v).alias("__sd")],
    )
    out = _join_state(df, state, group_cols)
    scaled = F.when(
        F.col("__sd") > 0,
        F.round((v - F.col("__mu")) / F.col("__sd"), ndigits) + F.lit(0.0),
    )
    return out.withColumn(out_col, scaled).drop("__mu", "__sd")


def minmax_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "scaled",
    ndigits: int = 4,
) -> DataFrame:
    """MinMaxScaler: ``(x - min) / (max - min)`` per group into [0, 1].
    min/max are exact input values (no interpolation), so this variant
    has NO cross-engine noise before the rounding; constant groups scale
    to NULL."""
    v = F.col(value_col).cast("double")
    state = _grouped(
        df, group_cols,
        [F.min(v).alias("__lo"), F.max(v).alias("__hi")],
    )
    out = _join_state(df, state, group_cols)
    scaled = F.when(
        F.col("__hi") > F.col("__lo"),
        F.round((v - F.col("__lo")) / (F.col("__hi") - F.col("__lo")), ndigits)
        + F.lit(0.0),
    )
    return out.withColumn(out_col, scaled).drop("__lo", "__hi")


def quantile_rank_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "scaled",
    tiebreak_col: str | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """QuantileTransformer (uniform output): percent_rank per group —
    rank/(n-1) in [0, 1]. Pure RATIONAL arithmetic (no interpolation, no
    stddev), so the output is bit-identical cross-engine UNROUNDED — the
    same property the dialect's PERCENT_RANK delivery relies on.
    ``tiebreak_col`` totalizes the order under value ties (pass the row
    id); without it, tied values share a rank (standard percent_rank
    semantics), which is also engine-stable. One window sort per group;
    single-row groups scale to 0.0 (percent_rank's defined value).

    ``group_cols`` is REQUIRED unless ``allow_global=True``: an ungrouped
    ``Window.partitionBy()`` funnels every row through ONE task — the
    classic scale killer (fine at notebook scale, catastrophic at 100 TB).
    The explicit opt-in documents that the caller accepts a single-
    partition sort of the whole frame."""
    from pyspark.sql import Window as W

    if not group_cols and not allow_global:
        raise ValueError(
            "quantile_rank_scale without group_cols is a GLOBAL single-"
            "partition window sort (every row through one task); pass "
            "group_cols, or allow_global=True to accept that on a small "
            "frame"
        )
    keys = [F.col(value_col).asc()]
    if tiebreak_col:
        keys.append(F.col(tiebreak_col).asc())
    w = (
        W.partitionBy(*group_cols) if group_cols else W.partitionBy()
    ).orderBy(*keys)
    return df.withColumn(out_col, F.percent_rank().over(w))


def loo_target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    out_col: str = "encoded",
) -> DataFrame:
    """Leave-one-out target encoding — the no-leakage categorical encoder
    (each row gets its category's mean target EXCLUDING itself, so the
    row's own label never reaches its feature): ``(sum - x) / (n - 1)``
    per category, pure column algebra over one window (no frame exclusion
    needed — Spark has none; the algebraic identity replaces it).
    Singleton categories encode to NULL (no peers to average). The
    numerator rounds to 2 dp (target sums of 2-dp inputs are true
    multiples of 0.01, so the re-round erases each engine's
    accumulation-order ULP noise), and the quotient is delivered
    UNROUNDED: both engines then divide bit-identical inputs, and IEEE
    division is correctly rounded, so the doubles match bit-for-bit. A
    final decimal rounding would REINTRODUCE a knife edge — quotients
    m/(100·(n-1)) land exactly on half-boundaries whenever (n-1) divides
    2·10^d·m, where Spark's HALF_UP and DuckDB's rounding legitimately
    disagree (observed at n-1 = 200).

    Physical shape (round-10, skew-hardened): fit = one bounded groupBy
    aggregate (sum, n per category — a handful of doubles), apply =
    broadcast join + column algebra. The earlier ``Window.partitionBy(
    category)`` shape funneled a hot category through ONE task; the
    groupBy's partial (map-side) aggregation pre-collapses hot keys, and
    the broadcast apply is scan-local — the same fit/transform split as
    the other scalers."""
    t = F.col(target_col).cast("double")
    state = df.groupBy(F.col(category_col).alias("__loo_k")).agg(
        F.sum(t).alias("__loo_s"), F.count(t).alias("__loo_n")
    )
    # Null-safe join: a NULL category is a real group (matching the
    # window semantics, where NULLs form their own partition).
    out = df.join(
        F.broadcast(state),
        F.col(category_col).eqNullSafe(F.col("__loo_k")),
        "left",
    )
    loo = (
        F.round(F.col("__loo_s") - t, 2)
        / (F.col("__loo_n") - F.lit(1)).cast("double")
    )
    return out.withColumn(
        out_col, F.when(F.col("__loo_n") > 1, loo)
    ).drop("__loo_k", "__loo_s", "__loo_n")
