"""Engine-portable mergeable sketches: HyperLogLog distinct counting,
KMV (k-minimum-values) distinct counting, Count-Min frequency estimation.

At 100 TB, exact COUNT(DISTINCT) and exact per-key frequency tables are
shuffle-bound: the shuffle moves every distinct key. Sketches bound the
moved state by construction:

  * HLL: the shuffle carries at most m = 2^p register rows per group
    (p=10 -> 1024) regardless of cardinality; registers merge with MAX,
    so per-partition / per-day / per-shard sketches roll up without
    rescanning history.
  * KMV: the k smallest distinct hash values. The plan is a
    TakeOrderedAndProject (no full sort); two sketches merge by union +
    re-take-k.
  * CMS: a depth x width integer counter grid (heavy-hitter frequency,
    always an OVERcount, never under). Grids merge by addition; point
    queries are a broadcast join against candidate keys.

Everything is engine-portable by construction (the same md5-derived
hashing as :mod:`.membership`): an ANSI oracle replays the EXACT
registers / k-th minimum / counter grid, so the estimates are
value-checkable bit-for-bit, not just statistically plausible.

Numeric portability notes (why the shapes below look the way they do):

  * rho (the HLL leading-zero rank) is derived from ``length(bin(w))``
    -- integer both engines -- never from ``floor(log2(w))``, whose
    libm ULP could flip at exact powers of two.
  * The harmonic sum ``sum(2^-rho)`` is accumulated as the INTEGER
    ``sum(1 << ((61-p) - rho))`` (scale 2^(61-p)); float summation
    would be partition-order-dependent. The total is <= m * 2^(61-p)
    = 2^61 < 2^63 for every p, so the BIGINT cannot overflow.
  * The only transcendental (ln in the linear-counting branch) feeds a
    round(..., 2), which absorbs cross-libm ULP noise; the branch
    CONDITION uses only +,*,/ on identical doubles, so both engines
    take the same branch.

Reference scope note: the Go reference (CustomDB) has no sketch tier --
its aggregates are exact single-node loops (Custom_DB/handlers/query.go);
this module is part of the beyond-reference at-scale analytics tier
(SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_BITS = 60


def hash60(key: Column) -> Column:
    """60-bit nonnegative hash from the first 15 md5 hex chars.
    DuckDB replays it as ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _check_p(p: int) -> None:
    # p >= 7 keeps the single alpha_m formula valid (Flajolet et al. give
    # dedicated constants below m=128); p <= 20 keeps rho's shift scale
    # 2^(61-p) a positive BIGINT power with the 60-bit hash.
    if not 7 <= p <= 20:
        raise ValueError(f"hll requires 7 <= p <= 20, got {p}")


def hll_registers(
    df: DataFrame, key_col: str | Column, p: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL register table for ``key_col``: one row per (group, bucket)
    with the max leading-zero rank ``rho``.

    bucket = h mod 2^p; w = h div 2^p (a (60-p)-bit value);
    rho = (60-p) - bitlen(w) + 1, with bitlen via ``length(bin(w))``
    (integer-exact on both engines; w=0 -> rho = 61-p).

    ONE shuffle, bounded at m=2^p rows per group by construction
    (map-side partial MAX makes the shuffle carry at most m rows per
    partition regardless of input cardinality). Output columns:
    ``group_cols... , bucket int, rho int``.
    """
    _check_p(p)
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    m = 1 << p
    gcols = list(group_cols or [])
    h = hash60(key)
    w = F.expr(f"__h DIV {m}")
    staged = df.select(*gcols, h.alias("__h")).select(
        *gcols,
        F.pmod(F.col("__h"), F.lit(m)).cast("int").alias("bucket"),
        (
            F.lit(HASH_BITS - p + 1)
            - F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
        ).cast("int").alias("__rho"),
    )
    return staged.groupBy(*gcols, "bucket").agg(F.max("__rho").alias("rho"))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """MAX-merge two register tables built with the SAME p: the rollup
    operation -- yesterday's sketch ∪ today's without rescanning."""
    gcols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, p: int,
                 group_cols: list[str] | None = None,
                 out_col: str = "hll_est") -> DataFrame:
    """Cardinality estimate from a register table (bias-corrected
    harmonic mean + linear counting for the small range).

    Pure integer aggregation (``sum(1 << ((61-p) - rho))``) followed by
    one float division -- partition-order-independent, replayable in
    ANSI SQL. Output: ``group_cols..., v_obs int, <out_col> double``
    (rounded to 2 dp; ``+ 0.0`` normalizes IEEE -0.0).
    """
    _check_p(p)
    m = 1 << p
    scale = HASH_BITS + 1 - p  # rho in [1, 61-p] -> shift in [0, 60-p]
    alpha = 0.7213 / (1 + 1.079 / m)
    gcols = list(group_cols or [])
    agg = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("int").alias("v_obs"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - rho)"))
        .alias("__zs"),
    )
    zst = F.col("__zs") + (F.lit(m) - F.col("v_obs")) * F.lit(1 << scale)
    z = zst.cast("double") / F.lit(float(1 << scale))
    e_raw = F.lit(alpha * float(m) * float(m)) / z
    v_zero = (F.lit(m) - F.col("v_obs")).cast("long")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(e_raw)
    return agg.select(
        *gcols, "v_obs", (F.round(est, 2) + F.lit(0.0)).alias(out_col)
    )


def hll_distinct(df: DataFrame, key_col: str | Column, p: int = 10,
                 group_cols: list[str] | None = None,
                 out_col: str = "hll_est") -> DataFrame:
    """registers -> estimate in one call (the common path)."""
    return hll_estimate(
        hll_registers(df, key_col, p, group_cols), p, group_cols, out_col
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values)
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, key_col: str | Column, k: int = 256) -> DataFrame:
    """The k smallest DISTINCT 60-bit hash values of ``key_col`` -- a
    TakeOrderedAndProject after a bounded distinct, never a full sort.
    Output: one column ``h`` (long), <= k rows."""
    if k < 2:
        raise ValueError("kmv requires k >= 2")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        df.select(hash60(key).alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union two KMV sketches and re-take the k smallest: identical to
    sketching the concatenated inputs (hash sets union exactly)."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int,
                 out_col: str = "kmv_est") -> DataFrame:
    """(k-1) / (h_k / 2^60) when the sketch is full; the observed count
    is exact when fewer than k distinct hashes exist. One row out:
    ``n_in_sketch int, <out_col> double`` (2 dp)."""
    agg = sketch.agg(
        F.count(F.lit(1)).cast("int").alias("n_in_sketch"),
        F.max("h").alias("__hk"),
    )
    est = F.when(
        F.col("n_in_sketch") < F.lit(k), F.col("n_in_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS))
        / F.col("__hk").cast("double")
    )
    return agg.select(
        "n_in_sketch", (F.round(est, 2) + F.lit(0.0)).alias(out_col)
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Set-operation estimates from two KMV sketches (the theta-sketch
    trick): merge to M = the k smallest hashes of A ∪ B, then

      * ``jaccard``       = |M ∩ S_A ∩ S_B| / |M| — the fraction of the
        union's k-minimum survivors present in BOTH input sketches (an
        unbiased Jaccard estimator because M is a uniform hash-order
        sample of A ∪ B),
      * ``est_union``     = the KMV cardinality estimate of M,
      * ``est_intersect`` = jaccard · est_union.

    Every step is exact integer/rational arithmetic over the shared
    60-bit hashes — membership joins, counts, and divisions of identical
    integers — so an ANSI oracle replays it bit-for-bit; only the final
    deliverables round (jaccard 4 dp, estimates 2 dp, ``+ 0.0``
    normalizing IEEE -0.0). Output: one row ``n_union_sketch int,
    n_both int, jaccard double, est_union double, est_intersect
    double``. All joins are over <= k-row frames (broadcast)."""
    m = kmv_merge(a, b, k)
    both = (
        m.join(F.broadcast(a), "h", "left_semi")
        .join(F.broadcast(b), "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("int").alias("n_both"))
    )
    stats = m.agg(
        F.count(F.lit(1)).cast("int").alias("n_union_sketch"),
        F.max("h").alias("__hk"),
    ).crossJoin(F.broadcast(both))
    union_raw = F.when(
        F.col("n_union_sketch") < F.lit(k),
        F.col("n_union_sketch").cast("double"),
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS))
        / F.col("__hk").cast("double")
    )
    jacc_raw = F.col("n_both").cast("double") / F.col("n_union_sketch")
    return stats.select(
        "n_union_sketch",
        "n_both",
        (F.round(jacc_raw, 4) + F.lit(0.0)).alias("jaccard"),
        (F.round(union_raw, 2) + F.lit(0.0)).alias("est_union"),
        (F.round(jacc_raw * union_raw, 2) + F.lit(0.0)).alias(
            "est_intersect"
        ),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantiles
# ---------------------------------------------------------------------------


def hist_build(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram over ``col``: one count per OBSERVED bin
    (``floor((x-lo)/width)`` clamped to [0, n_bins-1] — out-of-range
    values land in the edge bins). ONE shuffle bounded at n_bins rows by
    construction; histograms with the same (lo, hi, n_bins) merge by
    ``unionByName -> groupBy(bin) -> sum(cnt)``. Unlike GK/KLL/t-digest,
    the state layout is deterministic and engine-portable, so an ANSI
    oracle replays it exactly; the price is a fixed value-error bound of
    one bin width instead of a rank-error bound. Output: ``bin int,
    cnt long``."""
    if n_bins < 2:
        raise ValueError("hist requires n_bins >= 2")
    if not hi > lo:
        raise ValueError("hist requires hi > lo")
    width = (hi - lo) / n_bins
    gcols = list(group_cols or [])
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(b.cast("int"), F.lit(0)), F.lit(n_bins - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(*gcols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame, qs: list[float], lo: float, hi: float,
    n_bins: int = 1024, group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from an equi-width histogram: for each q, the
    first bin whose cumulative count reaches ``rank = ceil(q*n)``, with
    linear interpolation inside the bin. Integer/rational arithmetic
    throughout (the cumulative window, the rank comparison, the
    within-bin fraction), so both engines agree bit-for-bit before the
    delivered 2 dp rounding. The histogram side is <= n_bins rows — all
    joins broadcast. Output: ``q double, est_q double``."""
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    import functools

    from pyspark.sql import Window as W

    width = (hi - lo) / n_bins
    gcols = list(group_cols or [])
    spark = hist.sparkSession
    cumw = (
        W.partitionBy(*gcols) if gcols else W.partitionBy()
    ).orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = hist.select(*gcols, "bin", "cnt", F.sum("cnt").over(cumw).alias("cum"))
    n = (
        hist.groupBy(*gcols).agg(F.sum("cnt").alias("n"))
        if gcols
        else hist.agg(F.sum("cnt").alias("n"))
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    rank = F.ceil(F.col("q") * F.col("n")).cast("long")
    nq = qdf.crossJoin(F.broadcast(n)).alias("nq")
    ca = c.alias("c")
    cond = F.col("c.cum") >= F.ceil(F.col("nq.q") * F.col("nq.n")).cast("long")
    if gcols:
        cond = functools.reduce(
            lambda acc, g: acc & (F.col(f"nq.{g}") == F.col(f"c.{g}")),
            gcols,
            cond,
        )
    sel = (
        nq.join(F.broadcast(ca), cond)
        .groupBy(*[F.col(f"nq.{g}") for g in gcols], "nq.q", "nq.n")
        .agg(F.min(F.struct("c.bin", "c.cnt", "c.cum")).alias("s"))
        .select(
            *[F.col(f"nq.{g}").alias(g) for g in gcols],
            F.col("q"), F.col("n"), "s.bin", "s.cnt", "s.cum",
        )
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin")
        + (rank - (F.col("cum") - F.col("cnt"))).cast("double")
        / F.col("cnt").cast("double")
    )
    return sel.select(
        *gcols, "q", (F.round(est, 2) + F.lit(0.0)).alias("est_q")
    ).orderBy(*gcols, "q")


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def _cms_bucket(key: Column, i: int, width: int) -> Column:
    """Row-i bucket: md5 over a per-row salt prefix (``cms{i}|``), mod
    width. DuckDB replays the salt as ``'cms' || CAST(i AS VARCHAR) || '|'``."""
    return F.pmod(hash60(F.concat(F.lit(f"cms{i}|"), key)), F.lit(width))


def cms_build(df: DataFrame, key_col: str | Column,
              width: int = 1024, depth: int = 3) -> DataFrame:
    """Count-Min grid over the occurrences of ``key_col`` (multiset
    counts, not distinct). One shuffle, bounded at depth*width rows by
    construction. Output: ``i int, bucket int, cnt long``.

    Merge rule (not a separate helper because it is one line at the call
    site): two grids with the same (width, depth) merge by
    ``unionByName -> groupBy(i, bucket) -> sum(cnt)``.
    """
    if width < 2 or depth < 1:
        raise ValueError("cms requires width >= 2 and depth >= 1")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pos = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("i"),
            _cms_bucket(key, i, width).cast("int").alias("bucket"),
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(pos).alias("p"))
        .select("p.i", "p.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(cms: DataFrame, keys: DataFrame,
                        key_col: str, width: int = 1024,
                        depth: int = 3,
                        out_col: str = "cms_est") -> DataFrame:
    """Estimated count for each key in ``keys``: min over the depth rows
    of the key's counter (0 when a (i, bucket) cell saw no traffic).
    The grid side is <= depth*width rows -- it broadcasts; the candidate
    side explodes by depth only. Never an undercount (CMS guarantee).
    Output: ``keys.* , <out_col> long``."""
    kc = F.col(key_col)
    pos = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("i"),
            _cms_bucket(kc, i, width).cast("int").alias("bucket"),
        )
        for i in range(depth)
    ])
    probed = (
        keys.select(*keys.columns, F.explode(pos).alias("p"))
        .select(*keys.columns, "p.i", "p.bucket")
        .join(F.broadcast(cms), ["i", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
    return probed
