"""Graph operators: kNN graph construction and PageRank power iteration.

Companions to ``dedup.connected_components`` (hash-min label propagation):
where components answer "which docs form one duplicate cluster", PageRank
answers "which nodes are central" — e.g. the canonical representative of a
near-dup neighborhood, or influence over a similarity graph.

Scale design:
- ``knn_edges`` here is the EXACT all-pairs baseline (n² cosine + per-node
  top-k): right for sampled/small graphs and for oracle-checking. At corpus
  scale, generate candidate pairs with the approximate tiers first
  (``similarity.lsh_topk`` buckets / ``ivf`` lists /
  ``blocked_all_pairs_topk`` BLAS tiles) and rank only candidates.
- ``pagerank`` is the classic power iteration as DataFrame joins: each
  iteration is one join (static edge+degree table, localCheckpoint'ed once)
  plus one aggregation, with the new ranks checkpointed so the plan does
  not grow with the iteration count (the same lineage-hygiene pattern as
  ``connected_components``). Per-node contribution sums run in
  DECIMAL(38,18) — order-free, so ranks are bit-reproducible across
  partitionings, retries, and engines (the oracle mirrors the decimal
  sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import cosine


def knn_edges(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3
) -> DataFrame:
    """Directed kNN edges (src, dst, score): each node's top-``k`` cosine
    neighbors, ranked on the 6-dp ROUNDED score with a dst-id tiebreak so
    the edge set is deterministic and engine-reproducible (a 1-ulp cosine
    divergence cannot reorder the cut)."""
    a = df.select(F.col(id_col).alias("src"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("_vb"))
    scored = (
        a.join(b, F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("score").desc(), "dst")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize a directed edge list: both directions, deduplicated (a
    mutual kNN edge must not double its weight)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.union(rev).distinct()


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list; returns (node, rank).

    Uses the classic simplified update
    ``r'[v] = (1-d)/N + d * Σ_{u→v} r[u]/outdeg[u]`` with NO dangling-mass
    redistribution — callers must ensure every node has outdegree >= 1
    (automatic for symmetrized graphs from :func:`undirect`); this is
    asserted, because a dangling node would silently leak rank mass.

    Determinism: contribution sums are DECIMAL(38,18) (order-free); the
    teleport term is precomputed in one Python double so the oracle can
    reproduce the exact IEEE operation sequence.
    """
    nodes = edges.select(F.col(src).alias("node")).distinct()
    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    dangling = (
        edges.select(F.col(dst).alias("node"))
        .distinct()
        .join(nodes, "node", "left_anti")
        .count()
    )
    if dangling:
        raise ValueError(
            f"pagerank: {dangling} dangling node(s) (no out-edges); "
            "symmetrize the graph (undirect) or add self-loops"
        )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    teleport = (1.0 - damping) / n
    # Static per-iteration join input: checkpoint once, reuse n_iter times.
    e = edges.join(deg, src).localCheckpoint()
    nodes = nodes.localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = e.join(ranks, e[src] == ranks["node"]).select(
            F.col(dst).alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        sums = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
