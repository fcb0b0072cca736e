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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .util import lit_double_array


def _require_integral_id(df: DataFrame, id_col: str, fn: str) -> None:
    """The blocked tilers carry ids as int64 through Arrow — a non-integral
    id column would silently cast to NULL and its rows would vanish from
    the output (round-8 advice: fail fast instead)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"{fn} requires an integral id column (ids ride Arrow batches "
            f"as int64); {id_col!r} is {dt.simpleString()} — add a "
            "monotonically-increasing or hashed surrogate key first"
        )


def _safe_row_norms(mat):
    """Row norms with zero clamped to 1.0: a zero vector then scores 0.0
    against everything (dot with anything is 0) instead of NaN — which the
    >= / top-k comparisons would silently drop (round-8 advice)."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.where(norms == 0.0, 1.0, norms)


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


def quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    k: int = 10,
    rescore: int = 4,
) -> DataFrame:
    """Top-k by cosine with an int8-quantized FIRST PASS: the corpus scan
    ranks candidates on the quantized dot product
    ``dot(codes, q_codes) * scale * q_scale`` (integer multiply-adds over
    int8 codes — the memory-bandwidth-bound serving shape; at 100 TB the
    scan moves 4× fewer bytes than float32), keeps ``rescore * k``
    candidates via TakeOrderedAndProject, and rescoring re-ranks only
    those in exact float cosine. Same plan topology as
    :func:`brute_force_topk` — broadcast query, one corpus pass, k rows
    out — with the heavy pass on codes instead of floats."""
    qq = quantize_int8(query, "q", out_codes="q_codes", out_scale="q_scale")
    cand = quantize_int8(df, vec_col).crossJoin(F.broadcast(qq))
    approx = (
        cand.select(
            F.col(id_col),
            F.col(vec_col),
            F.col("q"),
            (
                F.aggregate(
                    F.zip_with(
                        "codes", "q_codes", lambda a, b: (a * b).cast("long")
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).cast("double")
                * F.col("scale")
                * F.col("q_scale")
            ).alias("approx_dot"),
        )
        .orderBy(F.col("approx_dot").desc(), F.col(id_col))
        .limit(rescore * k)
    )
    return (
        approx.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def all_pairs_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 20) -> DataFrame:
    """Top-k most similar pairs, brute force (exact). Quadratic — the
    reference baseline; use blocked_all_pairs_topk for the vectorized
    version of the same exact result, or LSH for approximate at scale."""
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


def blocked_all_pairs_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 20, n_blocks: int = 8
) -> DataFrame:
    """Exact all-pairs top-k via block-matrix cosine: rows are hashed into
    ``n_blocks`` blocks; every unordered block pair becomes one group whose
    rows (both blocks' vectors tagged by side) are handed to a numpy matmul
    in applyInPandas, which emits only its block-local top-k; a final global
    top-k merges the candidates.

    Scale shape: each vector is replicated ``n_blocks`` times (once per
    partner block) — O(n·B) shuffle — and the quadratic work happens inside
    BLAS on (n/B)² tiles, never as a row-level Spark cross join. This is the
    standard distributed exact-kNN tiling; at 100 TB you'd raise n_blocks so
    tiles fit executor memory.
    """
    import numpy as np
    import pandas as pd

    _require_integral_id(df, id_col, "blocked_all_pairs_topk")
    pair_schema = "id_a long, id_b long, score double"

    tagged = df.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))).alias("blk"),
    )
    partner = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("other")
    grid = (
        tagged.select("vid", "vec", "blk", partner)
        .withColumn("ba", F.least("blk", "other"))
        .withColumn("bb", F.greatest("blk", "other"))
        .dropDuplicates(["vid", "ba", "bb"])
    )

    def tile_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = int(pdf["ba"].iloc[0]), int(pdf["bb"].iloc[0])
        left = pdf[pdf["blk"] == ba]
        right = pdf[pdf["blk"] == bb]
        if left.empty or right.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "score"]).astype(
                {"id_a": "int64", "id_b": "int64", "score": "float64"}
            )
        la = np.stack(left["vec"].to_numpy())
        lb = np.stack(right["vec"].to_numpy())
        la = la / _safe_row_norms(la)
        lb = lb / _safe_row_norms(lb)
        sims = la @ lb.T
        ia = left["vid"].to_numpy()
        ib = right["vid"].to_numpy()
        rows_a = np.repeat(ia, len(ib))
        rows_b = np.tile(ib, len(ia))
        scores = sims.ravel()
        if ba == bb:
            # same-block tile: full n×n matrix → keep upper triangle only
            keep = rows_a < rows_b
            rows_a, rows_b, scores = rows_a[keep], rows_b[keep], scores[keep]
        else:
            # cross-block tile: each pair appears once — normalize id order
            rows_a, rows_b = np.minimum(rows_a, rows_b), np.maximum(rows_a, rows_b)
        if len(scores) > k:
            idx = np.argpartition(-scores, k)[:k]
            rows_a, rows_b, scores = rows_a[idx], rows_b[idx], scores[idx]
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "score": scores})

    candidates = grid.groupBy("ba", "bb").applyInPandas(
        lambda key, pdf: tile_topk(pdf), schema=pair_schema
    )
    return (
        candidates.select("id_a", "id_b", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "id_a", "id_b")
        .limit(k)
    )


def blocked_threshold_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs-above-threshold via the same block-matrix tiling as
    :func:`blocked_all_pairs_topk`: rows hash into ``n_blocks`` blocks, every
    unordered block pair becomes one tile whose cosine matrix runs in BLAS,
    and each tile emits ONLY the pairs with similarity ≥ ``threshold``
    (upper triangle / normalized id order, so every pair surfaces exactly
    once — no global dedup pass).

    Scale shape: O(n·B) shuffle for the tile replication; the quadratic
    term lives inside (n/B)² numpy tiles, never as a row-level cross join,
    and the output is bounded by the true near-duplicate count rather than
    a top-k cap. At 100 TB raise ``n_blocks`` so tiles fit executor memory
    (or pre-bucket with RP-LSH and run this per bucket for approximate).
    """
    import numpy as np
    import pandas as pd

    _require_integral_id(df, id_col, "blocked_threshold_pairs")
    pair_schema = "id_a long, id_b long, score double"

    tagged = df.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))).alias("blk"),
    )
    partner = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("other")
    grid = (
        tagged.select("vid", "vec", "blk", partner)
        .withColumn("ba", F.least("blk", "other"))
        .withColumn("bb", F.greatest("blk", "other"))
        .dropDuplicates(["vid", "ba", "bb"])
    )

    def tile_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["id_a", "id_b", "score"]).astype(
            {"id_a": "int64", "id_b": "int64", "score": "float64"}
        )
        ba, bb = int(pdf["ba"].iloc[0]), int(pdf["bb"].iloc[0])
        left = pdf[pdf["blk"] == ba]
        right = pdf[pdf["blk"] == bb]
        if left.empty or right.empty:
            return empty
        la = np.stack(left["vec"].to_numpy())
        lb = np.stack(right["vec"].to_numpy())
        la = la / _safe_row_norms(la)
        lb = lb / _safe_row_norms(lb)
        sims = la @ lb.T
        keep_r, keep_c = np.nonzero(sims >= threshold)
        if len(keep_r) == 0:
            return empty
        rows_a = left["vid"].to_numpy()[keep_r]
        rows_b = right["vid"].to_numpy()[keep_c]
        scores = sims[keep_r, keep_c]
        if ba == bb:
            # same-block tile: full n×n matrix → keep upper triangle only
            mask = rows_a < rows_b
            rows_a, rows_b, scores = rows_a[mask], rows_b[mask], scores[mask]
        else:
            # cross-block tile: each pair appears once — normalize id order
            rows_a, rows_b = np.minimum(rows_a, rows_b), np.maximum(rows_a, rows_b)
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "score": scores})

    return grid.groupBy("ba", "bb").applyInPandas(
        lambda key, pdf: tile_pairs(pdf), schema=pair_schema
    )


def _kmeans_centroids(
    sample: "list[list[float]]", n_centroids: int, n_iter: int, seed: int
) -> "list[list[float]]":
    """Plain Lloyd iterations over a small training sample, numpy-only.
    Centroids are L2-normalized (spherical k-means) so IVF assignment by
    max dot product agrees with cosine similarity."""
    import numpy as np

    x = np.asarray(sample, dtype="float64")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(x))
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(n_iter):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent.tolist()


def _centroid_dots(vec_name: str, centroids: "list[list[float]]") -> Column:
    """array<double> of dot(vec, centroid_i) — centroid weights ship as plan
    literals, so the whole assignment is JVM-side column algebra.

    Round-16 (guide §1.2 — driver overhead is part of the query): the
    expression is built as ONE SQL string parsed JVM-side instead of
    n_centroids × dim ``F.lit`` py4j round trips. At 16×64 weights the old
    construction spent ~1.8 s of driver time PER PLAN BUILD (measured —
    the dominant cost of the ann_multiassign bench queries, re-paid every
    invocation); the SQL text parses in ~8 ms and analyzes faster too.
    The parsed tree is the identical aggregate(zip_with(...)) fold in the
    identical order, so scores are bit-identical (verified row-for-row,
    and the oracle hash pins it end-to-end). ``vec_name`` is a plain
    column name (backtick-quoted here); weights are emitted via ``repr``
    (shortest round-trip decimal — Java's parseDouble restores the exact
    double) with the ``D`` suffix so SQL types them DOUBLE, never DECIMAL.
    """
    from .util import double_array_sql

    rows = [double_array_sql(c) for c in centroids]
    if any(r is None for r in rows):
        # non-finite weights have no portable SQL literal — keep the
        # py4j-built fallback for that (never-hit in practice) case
        return F.array(
            *[
                dot(F.col(vec_name), F.array(*[F.lit(float(w)) for w in c]))
                for c in centroids
            ]
        )
    # Quote the name the way F.col parses it (dots = struct-field nesting,
    # each part backtick-quoted/escaped) so both branches resolve alike.
    quoted = ".".join(
        f"`{p.replace('`', '``')}`" for p in vec_name.split(".")
    )
    # One transform over the centroid matrix rather than n_centroids
    # separate aggregates: 3 lambda resolutions instead of 2·n per analysis
    # pass (measured 216 → 149 ms per downstream select at 16×64), same
    # per-element fold order → bit-identical dots.
    mat = "array(" + ",".join(rows) + ")"
    return F.expr(
        f"transform({mat}, c -> aggregate(zip_with({quoted}, c, "
        "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )


def _argmax_1based(arr: Column) -> Column:
    return F.array_position(arr, F.array_max(arr))


def _arg_topn_1based(arr: Column, n: int) -> Column:
    """array<int> of the 1-based indices of the ``n`` LARGEST values in
    ``arr``, descending, index tie-break — the same (-value, idx) ranking
    the probe side uses, so build-side multi-assignment and query-side
    probing agree on ordering."""
    ranked = F.array_sort(
        F.transform(
            arr,
            lambda d, i: F.struct((-d).alias("neg"), (i + 1).alias("idx")),
        )
    )
    return F.transform(F.slice(ranked, 1, n), lambda s: s["idx"])


def _assign_lists(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "list[list[float]]",
    n_assign: int,
) -> DataFrame:
    """(id, vec, list_id) assignment frame. ``n_assign`` > 1 is IVF
    multi-assignment (round-10): each vector spills to its ``n_assign``
    nearest lists, the standard recall lever when partial-probe recall is
    pruning-bound — a query's true neighbor sitting just across a Voronoi
    boundary is now found in the adjacent list too. Storage and assignment
    write cost scale by n_assign; query cost is unchanged (same probed
    lists, ~n_assign× the candidates within them). Callers must dedupe
    candidates by id (copies are identical)."""
    dots = _centroid_dots(vec_col, centroids)
    if n_assign <= 1:
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            _argmax_1based(dots).alias("list_id"),
        )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(_arg_topn_1based(dots, n_assign)).alias("list_id"),
    )


def _approx_row_count(df: DataFrame) -> int:
    """Corpus size for modulus sizing, WITHOUT a data scan where possible:
    when the frame is a plain parquet file scan, sum the parquet footers'
    row counts (metadata-only — zero row groups read); otherwise fall back
    to one count-star job. The modulus only needs the right order of
    magnitude, so a footer count taken before any pushed filter is fine —
    an overestimate just shrinks the sample, which the driver-side
    ``train_limit`` cap already tolerates."""
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plan (e.g. in-memory test frame)
        files = []
    local = [f.removeprefix("file:") for f in files if f.startswith("file:")]
    if files and len(local) == len(files) and all(
        f.endswith(".parquet") for f in local
    ):
        try:
            import pyarrow.parquet as pq

            return sum(pq.ParquetFile(f).metadata.num_rows for f in local)
        except Exception:
            pass  # unreadable footer — pay the count job instead
    return df.count()


def _ivf_training_sample(
    df: DataFrame, id_col: str, vec_col: str, train_limit: int
) -> DataFrame:
    """(h, v) training sample: ``pmod(xxhash64(id), K) == 0`` with K sized
    from the corpus row count — taken from parquet footers when the frame
    is a file scan (metadata-only, no second corpus pass), else one
    column-less count job. The sample itself is a shuffle-free filtered
    projection; there is deliberately NO global sort / TakeOrdered anywhere
    in this plan (the previous ``orderBy(id).limit(n)`` formulation ranked
    every corpus row — a scale-killer at 100 TB)."""
    n = _approx_row_count(df)
    mod = max(1, n // train_limit)
    return df.select(
        F.xxhash64(F.col(id_col)).alias("h"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).filter(F.pmod(F.col("h"), F.lit(mod)) == 0)


def _train_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    train_limit: int,
    n_centroids: int,
    n_iter: int,
    seed: int,
) -> "list[list[float]]":
    """Deterministic coarse-quantizer training: hash-filtered sample
    (one corpus pass), driver-side cap ordered by hash (stable across
    partitioning/runs), spherical k-means.

    The footer-based modulus sizing can overshoot when the frame carries a
    selective filter (footers count pre-filter rows), starving the sample;
    if that happens, re-sample with a modulus from the frame's TRUE count —
    the extra count job only runs in the already-filtered (small-scan)
    case, so the unfiltered fast path stays one-pass."""
    sample_rows = _ivf_training_sample(df, id_col, vec_col, train_limit).collect()
    # Starvation check: re-sample whenever the footer-sized sample is well
    # below the requested training size (not merely below n_centroids — a
    # selectively filtered frame would otherwise silently train k-means on
    # ~n_centroids vectors instead of ~train_limit, degrading the quantizer).
    if len(sample_rows) < max(n_centroids, train_limit // 4):
        n = df.count()
        mod = max(1, n // train_limit)
        sample_rows = (
            df.select(
                F.xxhash64(F.col(id_col)).alias("h"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .filter(F.pmod(F.col("h"), F.lit(mod)) == 0)
            .collect()
        )
    if not sample_rows:
        raise ValueError("IVF training: corpus is empty")
    sample_rows.sort(key=lambda r: r.h)
    return _kmeans_centroids(
        [r.v for r in sample_rows[:train_limit]], n_centroids, n_iter, seed
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_limit: int = 512,
    n_iter: int = 8,
    seed: int = 42,
    n_assign: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse spherical-k-means
    quantizer partitions the corpus into ``n_centroids`` lists; a query
    scans only its ``n_probe`` nearest lists with exact cosine.
    ``n_assign`` > 1 spills each corpus vector to its n nearest lists
    (multi-assignment — the recall lever when partial-probe recall is
    IVF-pruning-bound; candidates dedupe before ranking).

    Training runs driver-side on a small deterministic hash sample
    (_ivf_training_sample — shuffle-free, sort-free, plan-asserted in
    tests/test_plans.py). This is the standard offline coarse-quantizer
    step; at real scale you
    train once (or with distributed kmeans||), persist the centroids, and
    write the corpus partitioned by list id so a probe becomes a
    partition-pruned scan instead of a full pass. Assignment and probing
    here are pure Column algebra over broadcast literals — no UDFs, one
    narrow map over the corpus, then a broadcast join against the probed
    list ids.
    """
    centroids = _train_centroids(
        df, id_col, vec_col, train_limit, n_centroids, n_iter, seed
    )

    listed = _assign_lists(df, id_col, vec_col, centroids, n_assign)
    # Query's n_probe nearest lists, in-plan: rank centroid dots via a
    # sorted array of (-dot, idx) structs, slice the prefix, explode.
    qd = _centroid_dots("q", centroids)
    probes = query.select(
        "q",
        F.explode(_arg_topn_1based(qd, n_probe)).alias("list_id"),
    )
    cand = listed.join(F.broadcast(probes), "list_id")
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("score"),
    )
    if n_assign > 1:
        # Copies of a spilled vector land in multiple probed lists as
        # EXACT duplicate (id, score) rows — dedupe before ranking so a
        # duplicate can't occupy two top-k slots.
        scored = scored.distinct()
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def ivf_topk_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_limit: int = 512,
    n_iter: int = 8,
    seed: int = 42,
    n_assign: int = 1,
) -> DataFrame:
    """Batched-query IVF top-k (round-9) — the SERVING shape: N queries
    answered in ONE plan, no per-query driver round trips. Every stage is
    column algebra over broadcast centroid literals:

    * the corpus assigns its inverted-list id in a narrow map;
    * EACH QUERY ranks the centroids in-plan and explodes its n_probe
      nearest list ids (queries × n_probe rows — the probe fan-out);
    * a broadcast equi-join on list_id pairs every query with ONLY its
      probed candidates (never a cross join — candidate count is
      |corpus| · n_probe/n_centroids per query);
    * exact cosine + a per-query window top-k (WindowGroupLimit pushes
      the rank filter into the sort).

    With n_probe = n_centroids the pruning vanishes and the result is
    the EXACT per-query top-k — which is how the oracle checks this
    operator end-to-end; partial probe trades recall exactly like
    single-query ivf_topk. Output: ``<qid>, <id>, score`` (score is
    exact cosine rounded to 6 dp, ties broken by id)."""
    from pyspark.sql import Window as W

    centroids = _train_centroids(
        df, id_col, vec_col, train_limit, n_centroids, n_iter, seed
    )
    listed = _assign_lists(df, id_col, vec_col, centroids, n_assign)
    qd = _centroid_dots(qvec_col, centroids)
    probes = queries.select(
        F.col(qid_col),
        F.col(qvec_col).alias("__qv"),
        F.explode(_arg_topn_1based(qd, n_probe)).alias("list_id"),
    )
    cand = listed.join(F.broadcast(probes), "list_id")
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("score"),
    )
    if n_assign > 1:
        # spilled copies are exact duplicate rows per (query, id) — dedupe
        # so one corpus vector can't fill two of a query's k slots
        scored = scored.distinct()
    w = W.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy(qid_col, F.col("score").desc(), F.col(id_col))
    )


def ivf_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    n_centroids: int = 16,
    train_limit: int = 512,
    n_iter: int = 8,
    seed: int = 42,
    n_assign: int = 1,
) -> "list[list[float]]":
    """Materialize an IVF index: train the coarse quantizer, assign every
    vector its inverted-list id (pure Column algebra over centroid
    literals), and write the corpus parquet PARTITIONED BY ``list_id``.
    Returns the centroids — persist them next to the index; they ARE the
    index metadata. ``n_assign`` > 1 spills each vector to its n nearest
    lists (multi-assignment) at n_assign× storage — probe with
    ``ivf_probe_indexed(dedup=True)``.

    This is the 100 TB serving shape `docs/SCALING.md` describes: build
    once (one training pass + one assignment/write pass), then every probe
    is a partition-pruned scan of ``n_probe`` directories instead of a
    full-corpus pass with in-plan assignment (which :func:`ivf_topk`, the
    index-free variant, pays per query)."""
    centroids = _train_centroids(
        df, id_col, vec_col, train_limit, n_centroids, n_iter, seed
    )
    listed = _assign_lists(df, id_col, vec_col, centroids, n_assign)
    listed.write.mode("overwrite").partitionBy("list_id").parquet(index_path)
    return centroids


def ivf_probe_indexed(
    spark,
    index_path: str,
    centroids: "list[list[float]]",
    id_col: str,
    vec_col: str,
    query_vec: "list[float]",
    k: int = 10,
    n_probe: int = 4,
    dedup: bool = False,
) -> DataFrame:
    """Query a materialized IVF index: rank centroids driver-side (a tiny
    numpy dot over the persisted quantizer — no corpus access), then read
    ONLY the ``n_probe`` nearest list partitions. The ``isin`` literal
    reaches the scan as a PartitionFilter (plan-asserted in
    tests/test_plans.py), so probe I/O is proportional to the probed
    lists, not the corpus. Exact cosine rescoring on the candidates.
    Pass ``dedup=True`` against an index built with multi-assignment
    (n_assign > 1) so a spilled vector's copies collapse to one row."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    # Mirror ivf_topk's in-plan ranking exactly: sort by (-dot, idx) with a
    # STABLE sort and an index tie-break — a bare argsort (non-stable) could
    # probe different lists than the in-plan variant on tied/near-tied
    # centroids, making the two variants disagree.
    dots = c @ q
    probes = [
        i + 1 for i in sorted(range(len(c)), key=lambda i: (-dots[i], i))[:n_probe]
    ]
    cand = spark.read.parquet(index_path).filter(F.col("list_id").isin(probes))
    qcol = lit_double_array(query_vec)
    scored = cand.select(
        F.col(id_col),
        F.round(
            cosine(F.col(vec_col).cast("array<double>"), qcol), 6
        ).alias("score"),
    )
    if dedup:
        scored = scored.distinct()
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def quantize_int8(
    df: DataFrame, vec_col: str, out_codes: str = "codes", out_scale: str = "scale"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|x| / 127``,
    ``code_i = round(x_i / scale)`` — the standard serving-side compression
    that shrinks float32 embedding storage 4× (and 8× vs float64) with a
    reconstruction error bounded by scale/2 per component. Pure Column
    algebra (``transform``/``array_max`` higher-order functions), JVM-side,
    zero shuffles — at 100 TB this is a narrow map over the corpus scan,
    and downstream ANN distance math runs on int8 codes at 4× the memory
    bandwidth. All-zero vectors get scale 0 and all-zero codes (not NULLs),
    so round-tripping is total."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(amax == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    return df.withColumn(out_scale, scale).withColumn(out_codes, codes)


def dequantize_int8(
    df: DataFrame, codes_col: str = "codes", scale_col: str = "scale",
    out: str = "approx",
) -> DataFrame:
    """Inverse map: ``approx_i = code_i * scale`` — reconstruction for
    rescoring stages that need float vectors back."""
    return df.withColumn(
        out,
        F.transform(F.col(codes_col), lambda c: c.cast("double") * F.col(scale_col)),
    )


def _lloyd_l2(sample, k: int, n_iter: int, seed: int):
    """Plain (non-spherical) L2 Lloyd iterations — PQ subspace codebooks
    quantize raw subvectors, so no normalization here (contrast
    _kmeans_centroids, whose spherical variant serves IVF's cosine
    assignment)."""
    import numpy as np

    x = np.asarray(sample, dtype="float64")
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    train_limit: int = 2048,
    n_iter: int = 8,
    seed: int = 42,
    centroids: "list | None" = None,
) -> "list":
    """Product-quantization codebooks (round-8): split each UNIT-NORMALIZED
    vector into ``m`` subvectors of dim/m components and train an L2
    k-means codebook of ``k_codes`` centroids per subspace, driver-side,
    on the same deterministic hash sample IVF training uses (one corpus
    pass, bounded collect ≤ train_limit rows). Returns a list of m numpy
    (k, dim/m) codebooks. Model size: m·k·(dim/m) floats — corpus-size
    independent, ships as plan literals.

    ``centroids`` (round-9): train on IVF RESIDUALS v̂ − c(v̂) instead of
    the raw unit vectors — the standard FAISS-IVFPQ accuracy lever
    (Jégou et al. 2011 §IV): residuals concentrate near the origin, so
    the same m·k_codes codebook budget quantizes them far more finely.
    Assignment uses the same argmax-dot rule the plan-side list
    assignment uses, so train/encode/scan agree on every vector."""
    import numpy as np

    if dim % m:
        raise ValueError("dim must be divisible by m")
    sub_d = dim // m
    sample_rows = _ivf_training_sample(df, id_col, vec_col, train_limit).collect()
    if len(sample_rows) < max(k_codes, train_limit // 4):
        n = df.count()
        mod = max(1, n // train_limit)
        sample_rows = (
            df.select(
                F.xxhash64(F.col(id_col)).alias("h"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .filter(F.pmod(F.col("h"), F.lit(mod)) == 0)
            .collect()
        )
    if not sample_rows:
        raise ValueError("PQ training: corpus is empty")
    sample_rows.sort(key=lambda r: r.h)
    x = np.asarray([r.v for r in sample_rows[:train_limit]], dtype="float64")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    if centroids is not None:
        C = np.asarray(centroids, dtype="float64")
        x = x - C[(x @ C.T).argmax(axis=1)]
    return [
        _lloyd_l2(x[:, j * sub_d : (j + 1) * sub_d], k_codes, n_iter, seed + j)
        for j in range(m)
    ]


def _pq_encode_udf(codebooks: "list"):
    """Arrow-vectorized PQ encoder: per batch, normalize rows and assign
    each subvector to argmin_c ||v_j - c||² = argmax_c (v_j·c - ||c||²/2)
    with one BLAS matmul per subspace. A plan-literal column-algebra
    formulation was measured ~50× slower (m·k interpreted aggregate dot
    products per row — 512 for m=16/k=32 — versus one (n, sub_d)×(sub_d,
    k) matmul per batch); same Arrow-over-literal-algebra trade the
    MinHash signature and SemDeDup assignment stages already make. The
    codebooks ride the closure as numpy constants — m·k·(dim/m) doubles,
    corpus-size independent."""
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    sub_d = cbs[0].shape[1]
    biases = [0.5 * (cb * cb).sum(axis=1) for cb in cbs]

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="object")
        x = np.stack(vs.to_numpy()).astype("float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), len(cbs)), dtype="int32")
        for j, (cb, bias) in enumerate(zip(cbs, biases)):
            sub = x[:, j * sub_d : (j + 1) * sub_d]
            codes[:, j] = (sub @ cb.T - bias).argmax(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return enc


def _pq_encode_residual_udf(codebooks: "list", centroids: "list"):
    """Round-9 residual variant of :func:`_pq_encode_udf`: takes (vector,
    1-based list_id) and encodes the IVF residual v̂ − centroid[list_id]
    against residual-trained codebooks — same one-matmul-per-subspace
    Arrow batch shape, plus one row-gather for the centroid subtraction.
    The list_id comes from the PLAN's assignment column so encode and
    scan can never disagree on a vector's list."""
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    C = np.asarray(centroids, dtype="float64")
    sub_d = cbs[0].shape[1]
    biases = [0.5 * (cb * cb).sum(axis=1) for cb in cbs]

    @pandas_udf("array<int>")
    def enc(vs: pd.Series, list_ids: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="object")
        x = np.stack(vs.to_numpy()).astype("float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        x = x - C[list_ids.to_numpy().astype("int64") - 1]
        codes = np.empty((len(x), len(cbs)), dtype="int32")
        for j, (cb, bias) in enumerate(zip(cbs, biases)):
            sub = x[:, j * sub_d : (j + 1) * sub_d]
            codes[:, j] = (sub @ cb.T - bias).argmax(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return enc


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 16,
    k_codes: int = 32,
    rescore: int = 8,
    train_limit: int = 2048,
    n_iter: int = 8,
    seed: int = 42,
    scan: DataFrame | None = None,
    centroids: "list | None" = None,
) -> DataFrame:
    """Approximate top-k by cosine via product quantization with
    asymmetric distance computation (ADC — Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the corpus
    scan reads m small int codes per vector (dim·4 bytes → m bytes of
    codes at 100 TB), the query-to-codebook dot-product table (m×k_codes
    doubles) is computed driver-side and shipped as plan literals, and
    each candidate's approximate score is m plan-literal table lookups
    (``element_at``). Encoding runs in one Arrow batch pass per partition
    (see _pq_encode_udf); scoring and the top-k stay JVM-side, zero
    shuffle. The ``rescore·k`` best candidates re-rank in exact float
    cosine (same tail as quantized_topk), so returned scores are exact
    and only recall is approximate (pytest pins ≥0.9 vs brute force —
    1.0 at the m=16/k_codes=32/rescore=8 defaults on the fixtures).

    ``scan`` (round-8): the frame to encode and score, when a coarse
    index has already pruned the corpus (see :func:`ivf_pq_topk`);
    defaults to ``df``. Codebooks always train on ``df`` — they are
    corpus-level model state, independent of any one query's pruning.

    ``centroids`` (round-9): residual coding — codes quantize the IVF
    residual v̂ − c(v̂) instead of the raw unit vector (codebooks train on
    residuals too), and the approximate score decomposes exactly as
    q·v̂ = q·c_list + q·r: the per-list constant ships as one extra
    plan-literal lookup on the scan's ``list_id`` column (which the
    ``scan`` frame must then carry). The FAISS-IVFPQ accuracy lever:
    residuals concentrate near the origin, so the same code budget
    quantizes them far more finely."""
    import numpy as np

    codebooks = pq_train(
        df, id_col, vec_col, dim, m, k_codes, train_limit, n_iter, seed,
        centroids=centroids,
    )
    qrow = query.limit(2).collect()
    if len(qrow) != 1:
        raise ValueError("pq_topk expects exactly one query row")
    # One contract for the whole ANN family (quantized_topk, ivf_topk,
    # lsh_topk): the query frame exposes the vector as column 'q'. Read
    # it by NAME — the positional qrow[0][0] read silently grabbed
    # whatever column happened to be first, then the rescore crossJoin
    # failed on F.col("q") anyway (round-9 advice).
    if "q" not in query.columns:
        raise ValueError(
            "pq_topk: query frame must expose the vector as column 'q' "
            f"(got columns {query.columns})"
        )
    q = np.asarray(list(qrow[0]["q"]), dtype="float64")
    qn = float(np.linalg.norm(q))
    if qn == 0.0:
        raise ValueError("pq_topk: query vector has zero norm")
    q = q / qn
    sub_d = dim // m
    # ADC table: table[j][c] = dot(q_j, codebook_j[c]) — m×k_codes doubles.
    tables = [
        [float(q[j * sub_d : (j + 1) * sub_d] @ c) for c in cb]
        for j, cb in enumerate(codebooks)
    ]
    base = df if scan is None else scan
    if centroids is not None:
        if "list_id" not in base.columns:
            raise ValueError(
                "pq_topk(centroids=...): the scan frame must carry the "
                "IVF assignment as column 'list_id'"
            )
        encoded = base.select(
            F.col(id_col),
            F.col(vec_col),
            F.col("list_id"),
            _pq_encode_residual_udf(codebooks, centroids)(
                F.col(vec_col).cast("array<double>"), F.col("list_id")
            ).alias("pq"),
        )
    else:
        encoded = base.select(
            F.col(id_col),
            F.col(vec_col),
            _pq_encode_udf(codebooks)(
                F.col(vec_col).cast("array<double>")
            ).alias("pq"),
        )
    adc = None
    for j, tab in enumerate(tables):
        lookup = F.element_at(
            lit_double_array(tab),
            F.element_at(F.col("pq"), j + 1) + 1,
        )
        adc = lookup if adc is None else (adc + lookup)
    if centroids is not None:
        # q·v̂ = q·c_list + q·r — the per-list constant as one lookup.
        qc = [float(q @ np.asarray(c, dtype="float64")) for c in centroids]
        adc = adc + F.element_at(
            lit_double_array(qc), F.col("list_id").cast("int")
        )
    cand = (
        encoded.select(F.col(id_col), F.col(vec_col), adc.alias("adc"))
        .orderBy(F.col("adc").desc(), F.col(id_col))
        .limit(rescore * k)
    )
    return (
        cand.crossJoin(F.broadcast(query))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 16,
    k_codes: int = 32,
    rescore: int = 8,
    ivf_train_limit: int = 512,
    pq_train_limit: int = 2048,
    n_iter: int = 8,
    seed: int = 42,
    residual: bool = True,
) -> DataFrame:
    """IVF + PQ composed (round-8) — the production ANN serving shape
    (FAISS's IVFPQ, Jégou et al. 2011): the coarse spherical-k-means
    quantizer prunes the corpus to the query's ``n_probe`` inverted
    lists, and only those candidates are PQ-encoded and ADC-scored, with
    the exact-cosine rescore tail. At 100 TB the two stages multiply:
    IVF cuts the scanned ROWS to n_probe/n_centroids of the corpus
    (partition pruning with a materialized index — ivf_build), PQ cuts
    the scanned BYTES per row from dim·4 to m.

    Round-9: codes quantize IVF RESIDUALS by default (``residual=True``
    — the standard FAISS-IVFPQ accuracy lever, Jégou et al. 2011 §IV):
    codebooks train on v̂ − c(v̂), the scan encodes residuals against its
    plan-assigned list_id, and the ADC score adds the per-list q·c
    constant back — exactly q·v̂ = q·c_list + q·r. Residuals concentrate
    near the origin, so the same m·k_codes budget quantizes them far
    more finely (pytest pins the PQ stage at parity with plain IVF and
    full-probe recall ≥0.9 vs brute force). ``residual=False`` keeps the
    round-8 raw-vector coding for comparison.

    Both quantizers train on the full corpus' deterministic hash sample
    (corpus-level model state); only the per-query scan is pruned."""
    centroids = _train_centroids(
        df, id_col, vec_col, ivf_train_limit, n_centroids, n_iter, seed
    )
    listed = df.select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_1based(_centroid_dots(vec_col, centroids)).alias(
            "list_id"
        ),
    )
    qd = _centroid_dots("q", centroids)
    ranked = F.array_sort(
        F.transform(
            qd,
            lambda d, i: F.struct((-d).alias("neg"), (i + 1).alias("idx")),
        )
    )
    probes = query.select(
        F.explode(
            F.transform(F.slice(ranked, 1, n_probe), lambda s: s["idx"])
        ).alias("list_id")
    )
    pruned = listed.join(F.broadcast(probes), "list_id")
    if not residual:
        pruned = pruned.select(F.col(id_col), F.col(vec_col))
    return pq_topk(
        df, id_col, vec_col, query, dim, k=k, m=m, k_codes=k_codes,
        rescore=rescore, train_limit=pq_train_limit, n_iter=n_iter,
        seed=seed, scan=pruned, centroids=centroids if residual else None,
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
        p = lit_double_array(plane)
        bit = F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_vec: str,
    right_id: str,
    right_vec: str,
    dim: int,
    threshold: float,
    n_planes: int | None = None,
    probe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate similarity JOIN between two tables (round-8): emit
    (left_id, right_id, score) for pairs with cosine ≥ ``threshold``,
    candidate-pruned by shared RP-LSH buckets instead of a cross join.

    Both sides hash with the SAME deterministic planes; the left side
    multi-probes (explodes to every bucket within ``probe_bits`` flipped
    bits — 1+n for probe_bits=1, +n(n-1)/2 for 2), candidates equi-join
    on bucket, and the exact cosine verify (JVM column algebra, no UDF)
    keeps only true above-threshold pairs — so precision is exactly 1.0
    and only recall is approximate (a pair hashing >probe_bits apart on
    every shared bucket is missed; for twin-grade cosine ≥ 0.999 the
    flip probability per plane is ~cos⁻¹(s)/π ≈ 0.6%, so recall at 12
    planes/1 probe bit is ≈ 99.8%). Zero-norm vectors never match: their
    cosine is NaN and NaN comparisons are false — same exclusion contract
    as the >=-threshold comparisons everywhere else; hash them out first
    if they need different handling.

    Scale shape: this is the embedding analogue of the bloom-prefiltered
    contamination join — each side shuffles once on bucket id (left
    ×(1+probes) for the probe explode), the join output is bounded by
    bucket co-occupancy (~n·m/2^p pairs), and the quadratic cross join
    never materializes. At 10^9×10^9 raise n_planes so buckets stay
    small; dedup of multi-probe hits happens pre-verify on the id pair."""
    if not 0 <= probe_bits <= 2:
        raise ValueError("probe_bits must be 0, 1, or 2")
    if n_planes is None:
        import math

        n = max(_approx_row_count(left), _approx_row_count(right))
        n_planes = max(2, min(24, int(math.log2(max(2.0, n / 64)))))
    lb = left.select(
        F.col(left_id).alias("id_l"),
        F.col(left_vec).alias("vl"),
        rp_lsh_bucket(F.col(left_vec), dim, n_planes, seed).alias("b0"),
    )
    probes = [F.col("b0")]
    probes += [
        F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
    ] if probe_bits >= 1 else []
    if probe_bits >= 2:
        probes += [
            F.col("b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    lprobed = lb.select(
        "id_l", "vl", F.explode(F.array(*probes)).alias("bucket")
    )
    rb = right.select(
        F.col(right_id).alias("id_r"),
        F.col(right_vec).alias("vr"),
        rp_lsh_bucket(F.col(right_vec), dim, n_planes, seed).alias("bucket"),
    )
    cand = lprobed.join(rb, "bucket").dropDuplicates(["id_l", "id_r"])
    score = cosine(F.col("vl"), F.col("vr"))
    return (
        cand.filter(score >= F.lit(threshold))
        .select("id_l", "id_r", F.round(score, 6).alias("score"))
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine over candidates sharing the query's
    LSH bucket or any 1-bit-flip neighbor bucket (multi-probe for recall).

    ``n_planes=None`` auto-sizes from the corpus row count (parquet footer
    metadata — no extra scan) targeting ~64 rows per bucket, so a small
    corpus gets few planes / big buckets (full recall at test scale) while
    a 10^9-row corpus gets ~24 planes and a candidate set in the low
    thousands — expected candidates n·(p+1)/2^p grows only log-wise."""
    if n_planes is None:
        import math

        n = _approx_row_count(df)
        n_planes = max(2, min(24, int(math.log2(max(2.0, n / 64)))))
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
