"""Dedup internals: parity pins for the Arrow-vectorized rewrites.

The numpy UDF paths (_simhash_pack_udf, _perm_mins_udf) replaced interpreted
higher-order Column formulations for speed; these tests pin the rewrites
bit-identical to the independent reference formulations so a future numpy
change can't silently alter signatures.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    dedup,
)

_WORDS = [
    "alpha", "beta", "gamma", "delta", "spark", "parquet", "engine",
    "quick", "brown", "fox", "lazy", "dog", "data", "pipeline", "token",
]


def _random_docs(seed: int = 7, n: int = 60) -> list[tuple[int, str | None]]:
    rng = random.Random(seed)
    rows: list[tuple[int, str | None]] = [
        (0, None),        # null text → null token hashes → simhash 0
        (1, ""),          # empty text → empty token array → simhash 0
        (2, "   "),       # whitespace-only normalizes to empty
        (3, "!!! ???"),   # punctuation-only normalizes to empty
        (4, "solo"),      # single token
    ]
    for i in range(5, n):
        rows.append(
            (i, " ".join(rng.choices(_WORDS, k=rng.randrange(1, 40))))
        )
    return rows


def test_simhash_udf_matches_column_reference(spark):
    docs = spark.createDataFrame(_random_docs(), ["doc_id", "text"])
    hashed = dedup._simhash_tokens(docs, "doc_id", "text")
    both = hashed.select(
        "doc",
        dedup._simhash_pack_udf()(F.col("hs")).alias("udf"),
        dedup._simhash_packed_column_reference().alias("ref"),
    ).collect()
    assert len(both) == 60
    mismatches = [(r.doc, r.udf, r.ref) for r in both if r.udf != r.ref]
    assert not mismatches, mismatches[:5]


def test_perm_mins_udf_vectorized_path_handles_mixed_batches(spark):
    # A batch mixing null, empty, and real shingle-hash arrays must NOT
    # degrade to the per-row path for the real rows (the masked reduceat
    # path covers them) and must produce exact per-permutation minima.
    params = dedup._perm_params(8)
    rows = [
        (0, None),
        (1, []),
        (2, [5]),
        (3, [17, 3, 99, 3]),
        (4, list(range(1000, 1300, 7))),
    ]
    df = spark.createDataFrame(rows, ["doc", "bh"])
    got = {
        r.doc: r.sig
        for r in df.select(
            "doc", dedup._perm_mins_udf(params)(F.col("bh")).alias("sig")
        ).collect()
    }
    assert got[0] is None
    assert got[1] == [None] * 8
    for doc, bh in rows[2:]:
        expect = [min((a * x + b) % dedup._MERSENNE_31 for x in bh) for a, b in params]
        assert got[doc] == expect, doc


def test_perm_mins_mersenne_fold_matches_modulo_on_edges(spark):
    # Round-15: the kernel computes x mod (2³¹−1) with the Mersenne
    # hi+lo fold instead of int64 division. Drive the UDF over inputs
    # CRAFTED so a·x+b lands exactly on multiples of M for the first
    # permutation (the fold's conditional-subtract edge: intermediate
    # M and M+1) plus a broad random sweep, and pin against plain %.
    M = dedup._MERSENNE_31
    params = dedup._perm_params(8)
    a0, b0 = params[0]
    inv_a0 = pow(a0, -1, M)
    # x with a0·x + b0 ≡ 0 (mod M), i.e. the reduced value is exactly 0
    edge = [(k * M - b0) % M * inv_a0 % M for k in range(1, 4)]
    edge = [x for x in edge if 0 <= x < M]
    import random

    rng = random.Random(31337)
    rows = [
        (0, edge),
        (1, [0, 1, M - 1]),
        (2, [rng.randrange(0, M) for _ in range(500)]),
    ]
    df = spark.createDataFrame(rows, ["doc", "bh"])
    got = {
        r.doc: r.sig
        for r in df.select(
            "doc", dedup._perm_mins_udf(params)(F.col("bh")).alias("sig")
        ).collect()
    }
    for doc, bh in rows:
        expect = [min((a * x + b) % M for x in bh) for a, b in params]
        assert got[doc] == expect, doc
    # the crafted rows really exercise the reduce-to-zero edge
    assert got[0][0] == 0


# --- winnowing --------------------------------------------------------------


def _winnow_model(text: str, k: int, w: int) -> set[tuple[str, int]]:
    """Independent Python reference: min-of-every-window over
    (gram, 1-based pos) keys, trailing short windows included."""
    n = len(text) - k + 1
    keys = [(text[i : i + k], i + 1) for i in range(max(n, 0))]
    out = set()
    for s in range(len(keys)):
        out.add(min(keys[s : s + w]))
    return out


def test_winnow_fingerprints_match_python_model(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "aaaaaaaaaaaa"),          # degenerate: all grams identical
        (4, "short"),                 # shorter than k -> no fingerprints
        (5, ""),                      # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.gram, r.pos)
        for r in dedup.winnow_fingerprints(df, "doc_id", "text", k=8, w=4).collect()
    }
    want = set()
    for d, t in rows:
        for g, p in _winnow_model(t, 8, 4):
            want.add((d, g, p))
    assert got == want
    assert not any(r[0] in (4, 5) for r in got)  # sub-k docs yield nothing


def test_winnow_shared_substring_guarantee(spark):
    # Any shared substring of length >= w + k - 1 must contribute at least
    # one identical selected gram to both docs, at ANY alignment offset.
    k, w = 8, 4
    shared = "zqxjkwvb unusual payload segment"  # len 32 >= w + k - 1 = 11
    rows = [
        (1, "prefix one " + shared + " tail a"),
        (2, "a very different and much longer prefix " + shared),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = dedup.winnow_fingerprints(df, "doc_id", "text", k=k, w=w)
    grams = {
        doc: {r.gram for r in rows_}
        for doc, rows_ in (
            (d, [r for r in fp.collect() if r.doc_id == d]) for d in (1, 2)
        )
    }
    shared_grams = grams[1] & grams[2]
    assert shared_grams, "winnowing guarantee violated: no shared fingerprint"
    # and the shared gram really comes from the planted payload
    assert any(g in shared for g in shared_grams)


def test_winnow_similar_pairs_counts_and_cap(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "totally unrelated content here xyz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.shared
        for r in dedup.winnow_similar_pairs(
            df, "doc_id", "text", k=8, w=4, max_doc_freq=None
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # doc-freq cap 1 drops every gram shared by the dup pair -> no pairs
    capped = dedup.winnow_similar_pairs(
        df, "doc_id", "text", k=8, w=4, max_doc_freq=1
    ).count()
    assert capped == 0


def test_winnow_kernel_segmented_matches_unsegmented(spark, monkeypatch):
    """r15 verdict #7: the kernel used to materialize one (n × k) uint32
    matrix per document — ~4·k·len(text) bytes, an OOM risk on one
    pathological multi-MB row. It now processes grams in overlapping
    segments of _WINNOW_SEG_CAP windows. Segmentation must be invisible:
    force a tiny cap so every doc spans many segments and pin the output
    against the independent Python model (which is also what the
    unsegmented kernel was pinned to), including repeated boilerplate
    (cross-segment duplicate grams) and multi-byte unicode."""
    import random

    rng = random.Random(16)
    words = ["alpha", "beta", "gamma", "reuse", "zq", "の", "変", "🦜"]
    long_random = " ".join(rng.choice(words) for _ in range(600))
    rows = [
        (1, long_random),                      # ~2.5k chars, many segments
        (2, "ab" * 900),                       # degenerate periodic text
        (3, ("boiler plate line " * 80) + long_random[:400]),
        (4, "短い文書です"),                    # shorter than k
    ]
    k, w = 8, 4
    monkeypatch.setattr(dedup, "_WINNOW_SEG_CAP", 97)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.gram, r.pos)
        for r in dedup.winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    want = {
        (d, g, p) for d, t in rows for g, p in _winnow_model(t, k, w)
    }
    assert got == want
    # cap floor: a cap below 2·w must not break segment construction
    monkeypatch.setattr(dedup, "_WINNOW_SEG_CAP", 1)
    got2 = {
        (r.doc_id, r.gram, r.pos)
        for r in dedup.winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    assert got2 == want


# --- graph: kNN edges + PageRank --------------------------------------------


def test_pagerank_star_graph_center_dominates(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        graph,
    )

    # undirected star: center 0 <-> leaves 1..4
    directed = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["src", "dst"]
    )
    edges = graph.undirect(directed)
    ranks = {r.node: r.rank for r in graph.pagerank(edges, n_iter=20).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    assert all(ranks[0] > ranks[i] for i in range(1, 5))
    # leaves are symmetric -> identical ranks
    assert len({round(ranks[i], 12) for i in range(1, 5)}) == 1
    # no dangling nodes -> rank mass conserved
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_rejects_dangling_and_empty(spark):
    import pytest
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        graph,
    )

    dangling = spark.createDataFrame([(1, 2)], ["src", "dst"])  # 2 has no out
    with pytest.raises(ValueError, match="dangling"):
        graph.pagerank(dangling)


def test_undirect_deduplicates_mutual_edges(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        graph,
    )

    directed = spark.createDataFrame([(1, 2), (2, 1), (1, 3)], ["src", "dst"])
    out = {(r.src, r.dst) for r in graph.undirect(directed).collect()}
    assert out == {(1, 2), (2, 1), (1, 3), (3, 1)}


def test_knn_edges_rounded_rank_and_degree(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        graph,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(vecs, ["id", "v"]).select(
        "id", F.col("v").cast("array<double>").alias("v")
    )
    edges = graph.knn_edges(df, "id", "v", k=1)
    nearest = {r.src: r.dst for r in edges.collect()}
    assert nearest == {0: 1, 1: 0, 2: 3, 3: 2}
    assert edges.count() == 4  # exactly k per node


def test_semantic_dedup_drops_planted_twins(spark):
    import math

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        semantic_dedup,
    )

    # Three well-separated directions (all-positive components so no two
    # centroid similarities tie exactly); 10/11 are near-parallel twins of
    # id 0, 21 of id 20.
    rows = [
        (0, [1.0, 0.1, 0.1, 0.1]),
        (10, [1.001, 0.1002, 0.1001, 0.1001]),  # twin of 0 (cos ≈ 1)
        (11, [0.999, 0.0999, 0.1, 0.1]),        # twin of 0
        (20, [0.1, 1.0, 0.1, 0.1]),
        (21, [0.1001, 0.998, 0.1, 0.1002]),     # twin of 20
        (30, [0.1, 0.1, 1.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "id LONG, v ARRAY<DOUBLE>")
    out = semantic_dedup(df, "id", "v", n_clusters=2, threshold=0.999)
    flags = {r.id: r.is_dup for r in out.collect()}
    assert len(flags) == 6
    # Lowest id in each near-dup set survives; its twins are dropped.
    assert flags[0] is False and flags[10] and flags[11]
    assert flags[20] is False and flags[21]
    assert flags[30] is False
    # Cluster assignment groups twins together (same cluster as their
    # original — the drop rule only sees cluster-mates).
    cl = {r.id: r.cluster_id for r in out.collect()}
    assert cl[0] == cl[10] == cl[11]
    assert cl[20] == cl[21]
    # Deduplicated corpus = the non-dup rows.
    kept = sorted(r.id for r in out.filter(~out.is_dup).collect())
    assert kept == [0, 20, 30]

    # centroids="kmeans" (the at-scale path — _train_centroids spherical
    # k-means instead of hash-picked rows): identical survivor set here,
    # since the drop rule only depends on twins landing in one cluster.
    out_km = semantic_dedup(
        df, "id", "v", n_clusters=2, threshold=0.999, centroids="kmeans"
    )
    kept_km = sorted(r.id for r in out_km.filter(~out_km.is_dup).collect())
    assert kept_km == [0, 20, 30]
    cl_km = {r.id: r.cluster_id for r in out_km.collect()}
    assert cl_km[0] == cl_km[10] == cl_km[11]
    assert cl_km[20] == cl_km[21]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="centroids"):
        semantic_dedup(df, "id", "v", centroids="bogus")


def test_edit_distance_pairs_blocking_and_exactness(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        edit_distance_pairs,
    )

    rows = [
        (1, "alpha centauri"),
        (2, "alpha centauri"),    # dist 0 to 1
        (3, "alpha centaurx"),    # dist 1 to 1/2
        (4, "alpha cent"),        # dist 4 to 1 — beyond max_dist
        (5, "beta centauri"),     # different block prefix
        (6, "alphx centauri"),    # dist 1 but mutation in.. pos 5 (in-block)
    ]
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs(df, "id", "k", max_dist=2, block_prefix=4).collect()
    }
    assert got[(1, 2)] == 0 and got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 6)] == 1  # mutation after the block prefix is caught
    assert (1, 4) not in got  # distance beyond the cutoff
    assert all(5 not in pair for pair in got)  # other block never compared
    # Length filter: keys differing by > max_dist chars never even join.
    long = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaabbbbbb")], ["id", "k"]
    )
    assert edit_distance_pairs(long, "id", "k", max_dist=2).count() == 0


def test_semantic_dedup_broadcast_assignment_matches_literal(spark, sf_dir):
    """The at-scale broadcast+Arrow-argmax assignment must reproduce the
    plan-literal path exactly — same 6-dp rounding, same lowest-index tie
    rule — on real fixture embeddings."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        semantic_dedup,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    lit = semantic_dedup(emb, "vec_id", "v", n_clusters=6, threshold=0.999)
    bc = semantic_dedup(
        emb, "vec_id", "v", n_clusters=6, threshold=0.999,
        assignment="broadcast",
    )
    a = {(r.vec_id): (r.cluster_id, r.is_dup) for r in lit.collect()}
    b = {(r.vec_id): (r.cluster_id, r.is_dup) for r in bc.collect()}
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError, match="assignment"):
        semantic_dedup(emb, "vec_id", "v", assignment="nope")


def test_duplicate_spans_and_cut(spark):
    """Round-12: exact-substring positional dedup (Lee et al. 2021) —
    cross-doc shared spans, same-doc periodic repeats, untouched uniques,
    and the cut companion's surviving token streams."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
    )

    rows = [
        (0, "a b c q r s t u d e f"),   # shares "q r s t u" with doc 1
        (1, "x y q r s t u z w"),
        (2, "m n o p m n o p m n o p"),  # period-4 self-repeat covers all
        (3, "unique words only here nothing shared"),
        (4, "tiny doc"),                 # < k tokens: no k-gram, exempt
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        tuple(r)
        for r in duplicate_spans(df, "doc_id", "text", k=5).collect()
    )
    assert spans == [(0, 3, 8, 5), (1, 2, 7, 5), (2, 0, 12, 12)]

    cut = {
        r.doc_id: (r.tokens, r.n_tokens, r.n_cut)
        for r in cut_duplicate_spans(df, "doc_id", "text", k=5).collect()
    }
    assert cut[0] == (["a", "b", "c", "d", "e", "f"], 6, 5)
    assert cut[1] == (["x", "y", "z", "w"], 4, 5)
    assert cut[2] == ([], 0, 12)  # fully duplicated doc vanishes
    assert cut[3][2] == 0 and cut[3][1] == 6  # untouched
    assert cut[4] == (["tiny", "doc"], 2, 0)  # sub-k doc passes through
    # guard
    with pytest.raises(ValueError, match="k must be"):
        duplicate_spans(df, "doc_id", "text", k=0)


def test_contaminated_spans_and_cut(spark):
    """Round-13: cross-corpus exact-substring decontamination — spans of
    TRAINING docs whose k-gram windows occur anywhere in the EVAL
    corpus. Same-doc / cross-train duplication does NOT mark (only eval
    overlap counts — the difference from duplicate_spans); clean docs
    pass through the cut untouched."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        contaminated_spans,
        cut_contaminated_spans,
    )

    train = spark.createDataFrame(
        [
            # leaks the eval phrase "the quick brown fox jumps" mid-doc
            (0, "intro words here the quick brown fox jumps tail words"),
            # duplicated WITHIN training (docs 1+2) but absent from eval:
            # must NOT mark — this is dedup's job, not decontamination's
            (1, "shared training phrase alpha beta gamma delta epsilon"),
            (2, "shared training phrase alpha beta gamma delta epsilon"),
            (3, "completely clean document with no overlap at all"),
            (4, "tiny doc"),  # < k tokens: exempt
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "benchmark asks the quick brown fox jumps over things")],
        "eval_id long, prompt string",
    )
    spans = sorted(
        tuple(r)
        for r in contaminated_spans(
            train, eval_df, "doc_id", "text", k=5, corpus_text_col="prompt"
        ).collect()
    )
    # doc 0 tokens: intro(0) words(1) here(2) the(3) quick(4) brown(5)
    # fox(6) jumps(7) tail(8) words(9); the only 5-gram shared with eval
    # is "the quick brown fox jumps" at pos 3 → span [3, 8)
    assert spans == [(0, 3, 8, 5)]

    cut = {
        r.doc_id: (r.tokens, r.n_tokens, r.n_cut)
        for r in cut_contaminated_spans(
            train, eval_df, "doc_id", "text", k=5, corpus_text_col="prompt"
        ).collect()
    }
    assert cut[0] == (["intro", "words", "here", "tail", "words"], 5, 5)
    assert cut[1][2] == 0 and cut[2][2] == 0  # train-only dups untouched
    assert cut[3][2] == 0
    assert cut[4] == (["tiny", "doc"], 2, 0)
    with pytest.raises(ValueError, match="k must be"):
        contaminated_spans(train, eval_df, "doc_id", "text", k=0)
