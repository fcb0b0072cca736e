"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine — pure Column algebra (``zip_with`` +
``aggregate``), JVM-side, no UDFs; O(n) per query, O(n²) all-pairs.

Scale path: random-hyperplane LSH — hash every vector into sign-pattern
buckets using deterministic pseudo-random planes; search touches only
bucket-mates (probing neighbors within 1 flipped bit for recall). At 100 TB
the bucketing is a narrow map + one shuffle on bucket id, and queries
broadcast against a pruned candidate set instead of the full corpus.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k rows of ``df`` by cosine similarity to the single-row ``query``
    (a DataFrame with one column ``q``). The query side is broadcast; the
    corpus is scanned once; Catalyst plans TakeOrderedAndProject for the
    top-k, so nothing but k rows crosses the final shuffle."""
    joined = df.crossJoin(F.broadcast(query))
    return (
        joined.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def all_pairs_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 20) -> DataFrame:
    """Top-k most similar pairs, brute force (exact). Quadratic — the
    oracle/baseline; use lsh_pairs_topk for corpus scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score")
        )
        .orderBy(F.col("score").desc(), "id_a", "id_b")
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rp_lsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane. Planes are
    deterministic driver-side constants (seeded), shipped as literals into
    the plan — no closure capture, no UDF."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        p = F.array(*[F.lit(w) for w in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine over candidates sharing the query's
    LSH bucket or any 1-bit-flip neighbor bucket (multi-probe for recall)."""
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    qb = query.select(
        F.col("q"), rp_lsh_bucket(F.col("q"), dim, n_planes, seed).alias("qbucket")
    ).select(
        "q",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cand = bucketed.join(F.broadcast(qb), "bucket")
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
