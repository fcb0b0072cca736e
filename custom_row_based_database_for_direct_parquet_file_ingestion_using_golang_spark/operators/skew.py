"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins;
these operators cover the two shapes AQE doesn't: a groupBy whose hot key
overwhelms one reducer, and an equi-join against a table whose key histogram
has a hot head. Both are pure DataFrame compositions.

  salted_aggregate   two-phase agg: partial agg on (keys, salt) spreads the
                     hot key over ``salt_n`` reducers, final agg merges.
                     Works for any algebraic aggregate (sum/count/min/max
                     merge with themselves or sum).
  salted_join        left rows get a random salt in [0, salt_n); right rows
                     are replicated once per salt value; the join key
                     becomes (key, salt) so a hot key's rows land on salt_n
                     reducers instead of one. Right-side inflation is the
                     price — use for dim-sized or filtered right sides that
                     are still too big (or too skewed) to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],  # (fn, col, out_name)
    salt_n: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) with an intermediate salt stage. ``avg`` is
    expressible as sum+count merged at the end; pass those explicitly."""
    for fn, _, _ in aggs:
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(salt_n)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](col).alias(out) for fn, col, out in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for fn, _, out in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the hot-key spread over salt_n partitions.
    Left/right column sets must be disjoint apart from the key.

    Only left-preserving join types are salt-safe: a right/full outer join
    would emit each unmatched right row once per salt replica.
    """
    left_preserving = {
        "inner", "cross",
        "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how not in left_preserving:
        raise ValueError(
            f"salted_join supports left-preserving join types only, not {how!r} "
            "(unmatched right rows would duplicate salt_n times)"
        )
    l = left.withColumn("__salt", F.floor(F.rand(seed=42) * salt_n).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Key-skew diagnostics: the top_k heaviest keys with their row
    counts, share of the table, and ratio versus the mean key weight —
    the number that decides whether a downstream join/groupBy on this
    key needs salting (``salted_join``/``salted_aggregate``), an AQE
    skew split, or nothing.

    Plan shape at 100 TB: ONE shuffle (the per-key partial+final count);
    the table-level totals come from a 1-row aggregate of the counted
    frame broadcast back onto it — never a global window (a single-
    partition sort over all distinct keys) and never a second scan of
    the base table. share and ratio are quotients of exact integers,
    delivered unrounded (IEEE division of identical operands is
    bit-identical cross-engine).
    """
    if not key_cols:
        raise ValueError("skew_report needs at least one key column")
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.join(F.broadcast(stats))
        .select(
            *key_cols,
            F.col("n"),
            (F.col("n") / F.col("__total")).alias("share"),
            # Divide FIRST: n * nkeys as a long*long product overflows
            # 2^63 at the scale this diagnostic exists for (~1e12 rows ×
            # ~1e9 keys) and Spark's non-ANSI arithmetic would wrap
            # silently. n/total is ≤ 1.0, so the double product is always
            # in range; the oracle mirrors the same association so the
            # IEEE result stays bit-identical cross-engine.
            (F.col("n") / F.col("__total") * F.col("__nkeys")).alias(
                "ratio_vs_mean"
            ),
        )
        .orderBy(F.col("n").desc(), *[F.col(c) for c in key_cols])
        .limit(top_k)
    )
