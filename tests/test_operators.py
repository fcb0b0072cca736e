"""Operator-level tests: dedup (exact + fuzzy vs brute force), similarity,
text analysis, multimodal plumbing, as-of/range joins on hand-built frames."""

from __future__ import annotations

import itertools
import os

import pytest

from pyspark.sql import Row, functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    dedup,
    joins,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "spark engines process completely different content"),  # shares words w/ 3
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _brute_jaccard(a: str, b: str, n: int) -> float:
    def sh(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_keeps_min_id(docs_df):
    out = dedup.exact_dedup(docs_df, ["text"], "doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 2, 3, 5]  # doc 4 (dup of 1) dropped, keeper is min id


def test_duplicate_groups(docs_df):
    groups = dedup.duplicate_groups(docs_df, ["text"], "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].keeper_id == 1 and groups[0].copies == 2


def test_jaccard_pairs_match_brute_force(docs_df):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs_df, "doc_id", "text", n=3).collect()
    }
    texts = dict(DOCS)
    for (ia, ib), j in got.items():
        assert j == pytest.approx(_brute_jaccard(texts[ia], texts[ib], 3)), (ia, ib)
    # every overlapping pair is present
    for ia, ib in itertools.combinations(texts, 2):
        if _brute_jaccard(texts[ia], texts[ib], 3) > 0:
            assert (min(ia, ib), max(ia, ib)) in got


def test_jaccard_max_doc_freq_drops_stop_shingles(spark):
    # 6 docs all sharing one boilerplate phrase (the stop-shingle), two of
    # which are also genuine near-dups. Uncapped, the hot shingle alone
    # joins every doc to every other (k² pairs); capped at 2, only the
    # genuine near-dup pair survives and its jaccard is computed over the
    # capped shingle universe.
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha beta gamma delta {boiler}"),
        (2, f"alpha beta gamma epsilon {boiler}"),  # near-dup of 1
        (3, f"one two three four {boiler}"),
        (4, f"five six seven eight {boiler}"),
        (5, f"nine ten eleven twelve {boiler}"),
        (6, f"red green blue yellow {boiler}"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dedup.jaccard_pairs(df, "doc_id", "text", n=3, max_doc_freq=None)
    capped = dedup.jaccard_pairs(df, "doc_id", "text", n=3, max_doc_freq=2)
    n_uncapped = uncapped.count()
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert n_uncapped == 15  # hot shingle meets every pair: C(6,2)
    assert set(got) == {(1, 2)}  # cap kills the k² fan-out, keeps the near-dup
    # docs 1/2: capped universes are the 4 shingles not touching the hot
    # boilerplate trigram chain... compute expected directly:
    # shingles of "alpha beta gamma delta subscribe to our newsletter" (n=3)
    # minus any shingle present in >2 docs; intersection/union of the rest.
    def caps(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    all_sh = [caps(t) for _, t in rows]
    hot = {s for s in set().union(*all_sh) if sum(s in d for d in all_sh) > 2}
    sa, sb = all_sh[0] - hot, all_sh[1] - hot
    assert got[(1, 2)] == pytest.approx(len(sa & sb) / len(sa | sb))


def test_minhash_lsh_finds_near_dups(docs_df):
    pairs = dedup.minhash_lsh_pairs(
        docs_df, "doc_id", "text", n=3, num_perm=64, bands=32, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found  # exact dup: jaccard 1.0, must collide
    assert (1, 2) in found or (2, 4) in found  # near-dup pair
    texts = dict(DOCS)
    for r in pairs:  # verification step guarantees exactness of reported j
        assert r.jaccard == pytest.approx(
            _brute_jaccard(texts[r.id_a], texts[r.id_b], 3)
        )


def test_minhash_lsh_join_incremental_dedup(spark, sf_dir):
    # Round-8: the new-batch-vs-corpus LSH join — every planted near-dup
    # (light edit of a corpus doc) matches its source, the unrelated
    # synthetic batch matches nothing, and every reported jaccard clears
    # the threshold (the exact-verify guarantee).
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        load,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.scale import (
        dedup_incremental_lsh,
    )

    # direct call: the workload retired from the driver registry in the
    # round-13 swap, but the join shape keeps its pytest coverage
    rows = dedup_incremental_lsh(spark, sf_dir).collect()
    planted = {
        int(r.doc_id) + 5_000_000
        for r in load(spark, sf_dir, "documents")
        .filter("doc_id % 10 = 0")
        .select("doc_id")
        .collect()
    }
    got_pairs = {(r.new_doc, r.corpus_doc) for r in rows}
    # each planted doc matches its own source...
    missing = {
        n for n in planted if (n, n - 5_000_000) not in got_pairs
    }
    assert not missing, f"planted near-dups missed: {sorted(missing)[:5]}"
    # ...and the unrelated batch (6e6 offset) matches nothing
    assert not [p for p in got_pairs if p[0] >= 6_000_000]
    assert all(r.jaccard >= 0.5 for r in rows)


def test_connected_components_multi_hop(spark):
    # Two components: a 4-node path 1-2-3-4 (forces 3 propagation rounds —
    # labels must travel the full diameter, not just one hop) and a 2-clique
    # {10, 11}. Node 99 has no edges and must be absent from the output.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comp = {
        r.node: r.comp
        for r in dedup.connected_components(edges, "id_a", "id_b").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_cycle(spark):
    # A cycle plus a chord — min label must win regardless of edge direction.
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5), (7, 8)], ["id_a", "id_b"]
    )
    comp = {
        r.node: r.comp
        for r in dedup.connected_components(edges, "id_a", "id_b").collect()
    }
    assert comp == {5: 5, 6: 5, 7: 5, 8: 5}


def test_simhash_pairs_exact_dup_zero_hamming(docs_df):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(docs_df, "doc_id", "text", max_hamming=6).collect()
    }
    assert pairs.get((1, 4)) == 0  # identical text → identical simhash


def test_cosine_column(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0, 1.0], b=[1.0, 0.0, 1.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0])]
    )
    vals = df.select(similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert vals[0].c == pytest.approx(1.0)
    assert vals[1].c == pytest.approx(0.0)


def test_brute_force_topk_self_first(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    top = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=5).collect()
    assert top[0].vec_id == 7 and top[0].score == pytest.approx(1.0)
    assert len(top) == 5
    assert all(top[i].score >= top[i + 1].score for i in range(4))


def test_lsh_topk_finds_planted_neighbor(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = similarity.lsh_topk(df, "vec_id", "embedding", q, dim=16, k=3).collect()
    ids = [r.vec_id for r in got]
    assert ids[0] == 0  # the query itself (same bucket, score 1)
    assert 1 in ids  # the planted neighbor survives bucketing


def test_lsh_topk_fills_k_on_fixture_corpus(spark, sf_dir):
    """Round-4 regression: lsh_topk once returned 7 of k=10 rows on the
    fixture embeddings (too many planes → starved candidate set). The
    auto-sized ``n_planes=None`` path must yield big-enough buckets that a
    small corpus fills k."""
    # (was the ann_lsh_top10 workload body until its round-12 retirement
    # in the one-for-one registry swap — the operator keeps the pin)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    rows = similarity.lsh_topk(emb, "vec_id", "embedding", q, dim=64, k=10).collect()
    assert len(rows) == 10, f"lsh_topk returned {len(rows)} of k=10"


def test_quantized_topk_matches_brute_force(spark, sf_dir):
    # int8 first pass + float rescore: self-similarity must rank first,
    # and recall@10 vs exact brute force must be near-total — int8 keeps
    # ~2 decimal digits of the dot product, enough that the rescore-4x
    # candidate set almost always contains the true top-10.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    quant = similarity.quantized_topk(emb, "vec_id", "embedding", q, k=10).collect()
    assert quant[0].vec_id == 7 and quant[0].score == pytest.approx(1.0)
    assert all(
        quant[i].score >= quant[i + 1].score for i in range(len(quant) - 1)
    )
    recall = len({r.vec_id for r in quant} & {r.vec_id for r in brute}) / 10
    assert recall >= 0.9, f"quantized recall@10 too low: {recall}"
    # rescored scores are EXACT float cosine, identical to brute force for
    # every overlapping id
    bscore = {r.vec_id: r.score for r in brute}
    for r in quant:
        if r.vec_id in bscore:
            assert r.score == pytest.approx(bscore[r.vec_id])


def test_pq_topk_recall_and_exact_rescore(spark, sf_dir):
    # Round-8 PQ/ADC: self-similarity ranks first, recall@10 vs brute
    # force ≥ 0.9 at the m=16/k_codes=32/rescore=8 defaults, and every
    # overlapping score is the EXACT float cosine (rescore guarantee).
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    pq = similarity.pq_topk(emb, "vec_id", "embedding", q, dim=64, k=10).collect()
    assert pq[0].vec_id == 7 and pq[0].score == pytest.approx(1.0)
    recall = len({r.vec_id for r in pq} & {r.vec_id for r in brute}) / 10
    assert recall >= 0.9, f"PQ recall@10 too low: {recall}"
    bscore = {r.vec_id: r.score for r in brute}
    for r in pq:
        if r.vec_id in bscore:
            assert r.score == pytest.approx(bscore[r.vec_id])
    # deterministic across invocations (seeded training + hash sample)
    again = similarity.pq_topk(emb, "vec_id", "embedding", q, dim=64, k=10).collect()
    assert [r.vec_id for r in again] == [r.vec_id for r in pq]
    with pytest.raises(ValueError, match="divisible"):
        similarity.pq_train(emb, "vec_id", "embedding", dim=64, m=7)


def test_ivf_topk_self_first_and_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    ivf = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=10, n_centroids=8, n_probe=4
    ).collect()
    # the query's own list is always probed → the query itself is rank 1
    assert ivf[0].vec_id == 0 and ivf[0].score == pytest.approx(1.0)
    assert all(ivf[i].score >= ivf[i + 1].score for i in range(len(ivf) - 1))
    # probing half the lists must recover most of the exact top-10
    recall = len({r.vec_id for r in ivf} & {r.vec_id for r in brute}) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"


def test_ivf_topk_full_probe_is_exact(spark, sf_dir):
    # probing every list degenerates to brute force — results must match
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=8).collect()
    ivf = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=8, n_centroids=4, n_probe=4
    ).collect()
    assert [r.vec_id for r in ivf] == [r.vec_id for r in brute]
    for a, b in zip(ivf, brute):
        assert a.score == pytest.approx(b.score)


def test_quantize_int8_round_trip_and_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 0.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, zero codes
            (2, [-2.0, 2.0, 1.0, -1.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = similarity.quantize_int8(df, "embedding")
    rows = {r.vec_id: r for r in q.collect()}
    assert rows[0].codes == [127, -64, 32, 0]  # round(0.25/ (1/127)) = 31.75→32
    assert rows[0].scale == pytest.approx(1.0 / 127)
    assert rows[1].codes == [0, 0, 0, 0] and rows[1].scale == 0.0
    assert rows[2].codes == [-127, 127, 64, -64]
    # codes always fit int8 and reconstruction error is bounded by scale/2
    # (plus float32 input noise) on real data
    emb = spark.createDataFrame(
        [(i, [((i * 37 + j * 11) % 100 - 50) / 7.0 for j in range(16)]) for i in range(50)],
        ["vec_id", "embedding"],
    )
    qq = similarity.dequantize_int8(similarity.quantize_int8(emb, "embedding"))
    bad = qq.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("approx"),
                lambda x, a: F.abs(x - a),
            )
        ).alias("err"),
        (F.col("scale") / 2 + F.lit(1e-9)).alias("bound"),
        F.array_max(F.transform("codes", lambda c: F.abs(c))).alias("cmax"),
    ).filter((F.col("err") > F.col("bound")) | (F.col("cmax") > 127))
    assert bad.count() == 0


def test_char_lm_cross_entropy_model_semantics(spark):
    # Hand-checkable corpus: doc1 "aaa" → bigrams [aa, aa]; doc2 "ab" →
    # [ab]. Corpus model: P(aa)=2/3, P(ab)=1/3.
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "ab")], ["doc_id", "text"]
    )
    import math

    out = {r.doc_id: r for r in text.char_lm_cross_entropy(df).collect()}
    assert out[1].n_bigrams == 2
    assert out[1].ce_bits == pytest.approx(round(-math.log2(2 / 3), 2))
    assert out[2].n_bigrams == 1
    assert out[2].ce_bits == pytest.approx(round(-math.log2(1 / 3), 2))
    # normalization: case folds, non-[a-z ] strips, short docs drop out
    df2 = spark.createDataFrame([(1, "AB?!"), (2, "x")], ["doc_id", "text"])
    out2 = {r.doc_id: r for r in text.char_lm_cross_entropy(df2).collect()}
    assert 2 not in out2 and out2[1].n_bigrams == 1


def test_token_counts_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, "a, b; c!")], ["id", "t"]
    )
    out = {
        r.id: (r.n, r.w)
        for r in df.select(
            "id",
            text.token_count("t").alias("n"),
            text.word_token_count("t").alias("w"),
        ).collect()
    }
    assert out[1] == (2, 2)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (3, 6)  # 'a' ',' 'b' ';' 'c' '!'


def test_quality_score_bounds_and_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and keeps on running fast " * 3
    bad = "!!! ??? ... ###"
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "t"])
    out = {r.id: r.q for r in df.select("id", text.quality_score("t").alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_lang_guess_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "el gato con la casa que"),
            (3, "der hund ist mit der katze und"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["id", "t"],
    )
    out = {r.id: r.g for r in df.select("id", text.lang_guess("t").alias("g")).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "de" and out[4] == "und"


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], ["id", "t"])
    out = {r.id: sorted(r.s) for r in df.select("id", text.shingles("t", 3).alias("s")).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == ["a b"]  # shorter than n → whole text


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")], ["id", "t"]
    )
    out = {r.id: r.fp for r in df.select("id", text.fingerprint("t").alias("fp")).collect()}
    assert out[1] == out[2] != out[3]


def test_pii_count_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.org or b@x.io, call 555-123-4567"),
            (2, "server at 192.168.1.20 and 10.0.0.1; phone 555-000-1111"),
            (3, "no pii here at all"),
        ],
        ["id", "t"],
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            text.pii_count("t", "email").alias("e"),
            text.pii_count("t", "phone").alias("p"),
            text.pii_count("t", "ipv4").alias("i"),
            text.redact_pii("t").alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].p, out[1].i) == (2, 1, 0)
    assert (out[2].e, out[2].p, out[2].i) == (0, 1, 2)
    assert (out[3].e, out[3].p, out[3].i) == (0, 0, 0)
    assert out[1].red == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert out[2].red == "server at <IP> and <IP>; phone <PHONE>"
    assert out[3].red == "no pii here at all"


def test_chunk_tokens_to_lines(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d", "e"]), (2, ["x"])], ["doc_id", "toks"]
    )
    out = {
        (r.doc, r.pos): r.line
        for r in dedup.chunk_tokens_to_lines(
            df, "doc_id", "toks", tokens_per_line=2
        ).collect()
    }
    assert out == {(1, 0): "a b", (1, 1): "c d", (1, 2): "e", (2, 0): "x"}


def test_line_dedup_stats(spark):
    boiler = "subscribe now"
    docs = [
        (1, ["alpha one", boiler, "alpha two"]),
        (2, ["beta one", boiler]),
        (3, [boiler, "gamma one"]),
        (4, ["shared tail", "delta one"]),
        (5, ["shared tail", "epsilon one"]),
    ]
    df = spark.createDataFrame(
        [(d, p, ln) for d, lines in docs for p, ln in enumerate(lines)],
        ["doc", "pos", "line"],
    )
    out = {r.doc: r for r in dedup.line_dedup_stats(df, max_doc_freq=2).collect()}
    # boiler appears in 3 docs (> 2) → dropped; 'shared tail' in 2 → kept.
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert (out[2].n_lines, out[2].n_kept) == (2, 1)
    assert (out[3].n_lines, out[3].n_kept) == (2, 1)
    assert (out[4].n_lines, out[4].n_kept) == (2, 2)
    import hashlib

    # reconstruction preserves original line order of the kept lines
    assert out[1].kept_fp == hashlib.md5(b"alpha one alpha two").hexdigest()
    assert out[3].kept_fp == hashlib.md5(b"gamma one").hexdigest()
    assert out[4].kept_fp == hashlib.md5(b"shared tail delta one").hexdigest()


def test_multimodal_features_and_stub(spark):
    df = spark.createDataFrame([(1, b"abc"), (2, b"x" * 100)], ["id", "payload"])
    media = multimodal.wrap_binary(df, "id", "payload", "image")
    row = media.filter(F.col("media_id") == 2).first()
    assert row.meta.n_bytes == 100 and row.kind == "image"
    feats = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    ref = multimodal.decode_image(b"x" * 100, fake=True)
    assert feats[2].width == ref["width"] and feats[2].height == ref["height"]
    assert feats[1].n_bytes == 3
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"abc", fake=False)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "l1"), (1, 25.0, "l2"), (2, 5.0, "l3")], ["k", "ts", "lv"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "lv")
    right = spark.createDataFrame(
        [(1, 9.0, "r1"), (1, 20.0, "r2"), (2, 6.0, "r3")], ["k", "ts", "rv"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "rv")
    out = {
        r.lv: r.rv
        for r in joins.asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_payload=["rv"]
        ).collect()
    }
    assert out == {"l1": "r1", "l2": "r2", "l3": None}  # l3: no right row ≤ 5.0


def test_range_join_window(spark):
    left = spark.createDataFrame([(1, 100.0, "a")], ["k", "ts", "lv"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "lv"
    )
    right = spark.createDataFrame(
        [(1, 100.0, "same"), (1, 150.0, "in"), (1, 400.0, "in2"), (1, 401.0, "out"), (2, 150.0, "wrongkey")],
        ["k", "ts", "rv"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "rv")
    out = sorted(
        r.r_rv
        for r in joins.range_join(
            left, right, on="k", left_ts="ts", right_ts="ts", window_seconds=300
        ).collect()
    )
    assert out == ["in", "in2"]  # strict lower bound excludes ts==100, upper 400 in, 401 out


def test_blocked_all_pairs_matches_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    brute = similarity.all_pairs_topk(emb, "vec_id", "embedding", k=10).collect()
    blocked = similarity.blocked_all_pairs_topk(emb, "vec_id", "embedding", k=10).collect()
    assert [(r.id_a, r.id_b) for r in brute] == [(r.id_a, r.id_b) for r in blocked]
    for rb, rk in zip(brute, blocked):
        assert rb.score == pytest.approx(rk.score, abs=1e-5)


def test_blocked_threshold_pairs_matches_brute_force(spark, sf_dir):
    """blocked_threshold_pairs must emit EXACTLY the above-threshold pair
    set a row-level cross join would — every pair once, none missed across
    tile boundaries (same-block triangle + cross-block id normalization)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Plant twins so the threshold set is non-trivial at every scale.
    twins = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.002).alias("v"),
    )
    corpus = emb.unionByName(twins)
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = similarity.cosine(F.col("va"), F.col("vb"))
    brute = {
        (r.id_a, r.id_b): r.score
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= 0.999)
        .select("id_a", "id_b", cos.alias("score"))
        .collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.score
        for r in similarity.blocked_threshold_pairs(
            corpus, "vec_id", "v", threshold=0.999, n_blocks=4
        ).collect()
    }
    assert brute.keys() == blocked.keys()
    assert len(brute) > 0
    for key in brute:
        assert brute[key] == pytest.approx(blocked[key], abs=1e-9)


def test_lsh_similarity_join_recall_and_precision(spark, sf_dir):
    # Round-8: the approximate similarity join's precision is exactly 1.0
    # (every emitted pair re-verified in exact cosine) and recall on the
    # planted twins must be total at test scale (few planes → big buckets
    # + 1-bit multi-probe).
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("qid"),
        F.transform("v", lambda x: x * 1.001 + 0.0003).alias("qv"),
    )
    # exact reference: brute-force cross join at the same threshold
    cos = similarity.cosine(F.col("qv"), F.col("v"))
    exact = {
        (r.qid, r.vec_id)
        for r in queries.crossJoin(emb).filter(cos >= 0.999).collect()
    }
    got = {
        (r.id_l, r.id_r)
        for r in QUERIES["embedding_similarity_join"](spark, sf_dir).collect()
    }
    assert got <= exact  # precision 1.0: no pair below threshold leaks
    planted = {(q, q - 2_000_000) for q, _ in exact}
    assert planted <= exact  # sanity: every twin is above threshold
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"LSH join recall {recall:.3f} vs exact"
    assert planted <= got, "a planted twin pair was missed"


def test_lsh_similarity_join_probe_bits(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.similarity import (
        lsh_similarity_join,
    )

    left = spark.createDataFrame([(1, [1.0, 0.0, 0.0])], ["lid", "lv"])
    right = spark.createDataFrame([(2, [1.0, 0.001, 0.0])], ["rid", "rv"])
    with pytest.raises(ValueError, match="probe_bits"):
        lsh_similarity_join(
            left, right, "lid", "lv", "rid", "rv", dim=3,
            threshold=0.9, probe_bits=3,
        )
    # probe_bits=2 widens the candidate set; identical-direction vectors
    # always share the 0-probe bucket, so the pair must surface at any
    # probe level.
    for pb in (0, 1, 2):
        rows = lsh_similarity_join(
            left, right, "lid", "lv", "rid", "rv", dim=3,
            threshold=0.999, n_planes=4, probe_bits=pb,
        ).collect()
        assert [(r.id_l, r.id_r) for r in rows] == [(1, 2)], pb


def test_blocked_tilers_guard_ids_and_zero_norms(spark):
    # Round-8 advice: non-integral ids fail fast (they'd silently cast to
    # NULL and vanish); zero-norm vectors score 0.0 instead of NaN (which
    # the threshold/top-k comparisons would silently drop).
    strdf = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], ["sid", "v"]
    )
    with pytest.raises(ValueError, match="integral id column"):
        similarity.blocked_all_pairs_topk(strdf, "sid", "v", k=2)
    with pytest.raises(ValueError, match="integral id column"):
        similarity.blocked_threshold_pairs(strdf, "sid", "v", threshold=0.5)

    zdf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0])], ["vid", "v"]
    )
    pairs = {
        (r.id_a, r.id_b): r.score
        for r in similarity.blocked_threshold_pairs(
            zdf, "vid", "v", threshold=-1.0, n_blocks=2
        ).collect()
    }
    # zero-norm row 3 participates with score 0.0 against both others
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert pairs[(1, 3)] == 0.0 and pairs[(2, 3)] == 0.0
    top = similarity.blocked_all_pairs_topk(zdf, "vid", "v", k=3, n_blocks=2)
    scores = {(r.id_a, r.id_b): r.score for r in top.collect()}
    assert scores[(1, 3)] == 0.0 and scores[(2, 3)] == 0.0


def test_area_resize_matches_block_means_and_transform_roundtrip(spark):
    # Round-8: area_resize equals the explicit per-block numpy mean on a
    # random image, and the distributed transform round-trips through a
    # real decode → resize → BMP re-encode → decode across formats.
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    got = multimodal.area_resize(img, 8, 8)
    want = np.stack(
        [
            np.stack(
                [
                    img[3 * i : 3 * i + 3, 5 * j : 5 * j + 5].astype(
                        "float64"
                    ).mean(axis=(0, 1))
                    for j in range(8)
                ]
            )
            for i in range(8)
        ]
    )
    assert np.allclose(got, want)
    with pytest.raises(ValueError, match="positive"):
        multimodal.area_resize(img, 0, 8)

    # cross-format: a PNG input resizes identically to its BMP twin
    rows = [
        (1, multimodal.encode_bmp(img)),
        (2, multimodal.encode_png(img)),
    ]
    media = multimodal.wrap_binary(
        spark.createDataFrame(rows, ["id", "payload"]), "id", "payload", "image"
    )
    resized = multimodal.transform_image_resize(media, out_w=8, out_h=8)
    out = {r.media_id: r for r in resized.collect()}
    assert out[1].width == 8 and out[1].height == 8
    assert bytes(out[1].payload) == bytes(out[2].payload)  # same pixels in
    d = multimodal.decode_bmp(bytes(out[1].payload))
    assert d["width"] == 8 and d["height"] == 8
    assert np.array_equal(
        d["pixels"], np.clip(np.round(want), 0, 255).astype(np.uint8)
    )


def test_audio_resample_exact_on_ramp_and_through_mulaw(spark):
    # Round-8: dyadic-ratio resample of a ramp is sample-exact, the
    # re-encoded WAV decodes at the new rate, and the transform accepts
    # the G.711 μ-law container (decode handles it; output is PCM16).
    import numpy as np

    ramp = (3 + 4 * np.arange(101)).astype(np.int16)
    rows = [
        (1, multimodal.encode_wav(ramp, 8000)),
        (2, multimodal.encode_wav_mulaw(multimodal.linear_to_mulaw(ramp), 8000)),
    ]
    media = multimodal.wrap_binary(
        spark.createDataFrame(rows, ["id", "payload"]), "id", "payload", "audio"
    )
    out = {
        r.media_id: r
        for r in multimodal.transform_audio_resample(media, 6400).collect()
    }
    m = (101 - 1) * 4 // 5 + 1
    d = multimodal.decode_wav(bytes(out[1].payload))
    assert out[1].sample_rate == 6400 and out[1].n_samples == m
    assert d["sample_rate"] == 6400
    assert np.array_equal(d["samples"], (3 + 5 * np.arange(m)).astype(np.int16))
    # μ-law input: lossy codec, but length/rate contract identical and
    # values within companding error of the exact ramp
    d2 = multimodal.decode_wav(bytes(out[2].payload))
    assert d2["sample_rate"] == 6400 and len(d2["samples"]) == m
    err = np.abs(d2["samples"].astype("int64") - (3 + 5 * np.arange(m)))
    assert err.max() <= 32  # G.711 segment quantization bound at this level
    with pytest.raises(ValueError, match="out_rate"):
        multimodal.transform_audio_resample(media, 0)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"v" * 4096), (2, b"a" * 10)], ["id", "payload"])
    media = multimodal.wrap_binary(df, "id", "payload", "video")
    frames = multimodal.frame_sample_plan(media, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_no)
    assert by_id[1] == [0, 2]  # 4 pseudo-frames sampled every 2
    assert by_id[2] == [0]    # tiny payload → 1 frame
    # offsets derive from metadata, not decode
    offs = {(r.media_id, r.frame_no): r.byte_offset for r in frames}
    assert offs[(1, 2)] == 4096 * 2


def test_sliding_window_sum_and_avg(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        sliding_value_avg,
        sliding_value_sum,
    )

    s = run_to_memory(
        sliding_value_sum(read_events_stream(spark, sf_dir)), mode="complete"
    )
    a = run_to_memory(
        sliding_value_avg(read_events_stream(spark, sf_dir)), mode="complete"
    )
    sums = {r.ws: (r.n, r.total) for r in s.collect()}
    avgs = {r.ws: (r.n, r.avg_value) for r in a.collect()}
    assert sums.keys() == avgs.keys() and len(sums) > 0
    for ws, (n, total) in sums.items():
        an, avg = avgs[ws]
        assert an == n
        assert avg == pytest.approx(total / n, abs=0.01)


def test_bmp_codec_round_trip():
    # Real encode→decode round trip, gradient pixels, width NOT a multiple
    # of 4 so the per-row padding path is exercised; any padding/row-order/
    # channel-order mistake corrupts the recovered array.
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    payload = multimodal.encode_bmp(px)
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + ((7 * 3 + 3) // 4 * 4) * 5
    d = multimodal.decode_bmp(payload)
    assert (d["width"], d["height"], d["channels"]) == (7, 5, 3)
    assert np.array_equal(d["pixels"], px)
    assert d["pixel_sum"] == int(px.sum())
    assert d["mean_pixel"] == pytest.approx(px.mean())
    # dispatch: decode_image takes the real path for BMP payloads
    assert multimodal.decode_image(payload) == {
        "width": 7, "height": 5, "channels": 3,
    }
    # top-down BMP (negative height) decodes to the same array
    import struct as _struct

    neg = bytearray(payload)
    neg[22:26] = _struct.pack("<i", -5)
    flipped = multimodal.decode_bmp(bytes(neg))
    assert np.array_equal(flipped["pixels"], px[::-1])
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"not a bitmap")
    with pytest.raises(NotImplementedError):
        # 8bpp header is a real BMP we can't decode without a palette path
        bad = bytearray(payload)
        bad[28:30] = _struct.pack("<H", 8)
        multimodal.decode_bmp(bytes(bad))


def test_png_codec_round_trip():
    # Real encode→decode round trip, random pixels over enough rows that
    # every scanline filter type (None/Sub/Up/Average/Paeth — encoder
    # cycles y % 5) is exercised; skipping any filter inverse corrupts the
    # recovered array.
    import struct as _struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    payload = multimodal.encode_png(px)
    assert payload[:8] == multimodal.PNG_SIG
    d = multimodal.decode_png(payload)
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (7, 11, 3, 8)
    assert np.array_equal(d["pixels"], px)
    assert d["pixel_sum"] == int(px.sum())
    assert d["mean_pixel"] == pytest.approx(px.mean())
    # dispatch: decode_image takes the real path for PNG payloads
    assert multimodal.decode_image(payload) == {
        "width": 7, "height": 11, "channels": 3,
    }
    # chunk CRC corruption must be detected, not silently decoded
    bad = bytearray(payload)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(bad))
    with pytest.raises(ValueError):
        multimodal.decode_png(b"not a png at all")
    # 16-bit depth is a real PNG we deliberately don't decode
    ihdr = _struct.pack(">IIBBBBB", 7, 11, 16, 2, 0, 0, 0)
    deep = (
        multimodal.PNG_SIG
        + _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + _struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + payload[8 + 12 + 13:]
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(deep)


def test_gif_codec_round_trip():
    # Real encode→decode round trip through hand-rolled LZW: random
    # indices stress dictionary growth across code-width bumps; the
    # low-entropy image exercises long runs and the KwKwK special case.
    import numpy as np

    rng = np.random.default_rng(23)
    idx = rng.integers(0, 256, size=(20, 31), dtype=np.uint8)
    payload = multimodal.encode_gif(idx)
    assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"
    d = multimodal.decode_gif(payload)
    assert (d["width"], d["height"], d["channels"]) == (31, 20, 3)
    assert np.array_equal(d["indices"], idx)
    # grayscale palette: luminance sum is 3x the index sum
    assert d["pixel_sum"] == int(idx.astype(np.int64).sum()) * 3
    assert d["mean_pixel"] == pytest.approx(idx.mean())
    # KwKwK / run-heavy image
    runs = np.zeros((13, 57), dtype=np.uint8)
    runs[::2] = 9
    assert np.array_equal(
        multimodal.decode_gif(multimodal.encode_gif(runs))["indices"], runs
    )
    # large random image crosses the 12-bit ceiling and dictionary reset
    big = rng.integers(0, 256, size=(150, 180), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_gif(multimodal.encode_gif(big))["indices"], big
    )
    # dispatch: decode_image takes the real path for GIF payloads
    assert multimodal.decode_image(payload) == {
        "width": 31, "height": 20, "channels": 3,
    }
    with pytest.raises(ValueError):
        multimodal.decode_gif(b"not a gif")
    # interlace flag is a real GIF we deliberately don't decode
    bad = bytearray(payload)
    # image descriptor starts after 6 (hdr) + 7 (lsd) + 768 (palette)
    assert bad[781] == 0x2C
    bad[781 + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        multimodal.decode_gif(bytes(bad))


def test_animated_gif_demux_and_frame_sampling(spark):
    # Multi-frame GIF89a: NETSCAPE loop + per-frame graphic-control
    # extensions; demux must recover every frame's pixels, delay, and
    # offset, and the mapInPandas sampler must run the same walk
    # distributed-side.
    import numpy as np

    rng = np.random.default_rng(31)
    all_frames = {}
    rows = []
    for mid in range(3):
        frames = [
            rng.integers(0, 256, size=(8, 11), dtype=np.uint8)
            for _ in range(4 + mid)
        ]
        all_frames[mid] = frames
        rows.append((mid, bytearray(multimodal.encode_gif_animated(frames, delay_cs=5))))
    d = multimodal.demux_gif(bytes(rows[0][1]))
    assert d["n_frames"] == 4
    for i, fr in enumerate(d["frames"]):
        assert np.array_equal(fr["indices"], all_frames[0][i])
        assert fr["delay_cs"] == 5
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = multimodal.wrap_binary(df, "media_id", "payload", "video")
    got = multimodal.sample_gif_frames(media, every_n=2).collect()
    # 4/5/6 frames per media sampled every 2nd: 2 + 3 + 3 descriptors
    assert len(got) == 2 + 3 + 3
    for r in got:
        expect = int(all_frames[r.media_id][r.frame_no].astype(np.int64).sum()) * 3
        assert r.pixel_sum == expect
    with pytest.raises(ValueError):
        multimodal.sample_gif_frames(media, every_n=0)


def test_wav_codec_round_trip():
    import numpy as np

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=301).astype(np.int16)
    payload = multimodal.encode_wav(samples, 16000, 1)
    assert len(payload) == 44 + 2 * 301
    d = multimodal.decode_wav(payload)
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (16000, 1, 301)
    assert d["duration_ms"] == 301 * 1000 // 16000
    assert np.array_equal(d["samples"], samples)
    assert d["abs_sum"] == int(np.abs(samples.astype(np.int64)).sum())
    # stereo: n_samples counts frames, not interleaved values
    stereo = multimodal.decode_wav(
        multimodal.encode_wav(samples[:300], 8000, 2)
    )
    assert stereo["n_channels"] == 2 and stereo["n_samples"] == 150
    # chunk walk: an unknown chunk BEFORE fmt/data must be skipped
    import struct as _struct

    extra = (
        payload[:12]
        + _struct.pack("<4sI", b"LIST", 6) + b"junk12"
        + payload[12:]
    )
    assert multimodal.decode_wav(extra)["abs_sum"] == d["abs_sum"]
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxJUNK")
    assert multimodal.decode_audio(payload) == {
        "sample_rate": 16000, "n_channels": 1, "duration_ms": 18,
    }


def test_real_media_files_through_binary_source(spark, tmp_path):
    # The reference ships real image files on disk (Custom_DB/data/.../Image);
    # prove the equivalent path here: write spec-conformant BMP/WAV FILES,
    # ingest via Spark's binaryFile source, and extract features from the
    # genuinely decoded bytes distributed-side.
    import numpy as np

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    rng = np.random.default_rng(3)
    pixel_sums = {}
    for i in range(4):
        px = rng.integers(0, 256, size=(6 + i, 9 + i, 3), dtype=np.uint8)
        (media_dir / f"img_{i}.bmp").write_bytes(multimodal.encode_bmp(px))
        pixel_sums[i] = int(px.sum())
    files = spark.read.format("binaryFile").load(str(media_dir) + "/*.bmp")
    media = multimodal.wrap_binary(
        files.select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp", 1)
            .cast("long")
            .alias("fid"),
            F.col("content"),
        ),
        "fid",
        "content",
        "image",
    )
    feats = {r.media_id: r for r in multimodal.extract_bmp_features(media).collect()}
    assert len(feats) == 4
    for i in range(4):
        assert feats[i].width == 9 + i and feats[i].height == 6 + i
        assert feats[i].pixel_sum == pixel_sums[i]


def test_avi_codec_round_trip(spark):
    # Real encode→demux round trip for the uncompressed-AVI container:
    # per-frame offsets, sizes, and pixel sums must come from genuinely
    # walked chunks and decoded pixel arrays.
    import numpy as np

    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)
    ]
    avi = multimodal.encode_avi(frames, fps=24)
    d = multimodal.demux_avi(avi)
    assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (9, 6, 24, 5)
    fsz = ((9 * 3 + 3) // 4 * 4) * 6
    for i, fr in enumerate(d["frames"]):
        assert fr["frame_no"] == i
        assert fr["offset"] == 8 + i * (8 + fsz)
        assert fr["n_bytes"] == fsz
        assert fr["pixel_sum"] == int(frames[i].sum())
    with pytest.raises(ValueError):
        multimodal.demux_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        multimodal.encode_avi([])

    # distributed sampling: every_n=2 keeps frames 0, 2, 4 with real stats
    df = spark.createDataFrame([(7, bytearray(avi))], ["id", "payload"])
    media = multimodal.wrap_binary(df, "id", "payload", "video")
    got = {
        r.frame_no: r
        for r in multimodal.sample_avi_frames(media, every_n=2).collect()
    }
    assert sorted(got) == [0, 2, 4]
    assert got[2].pixel_sum == int(frames[2].sum())
    assert got[4].byte_offset == 8 + 4 * (8 + fsz)
    with pytest.raises(ValueError):
        multimodal.sample_avi_frames(media, every_n=0)


def test_ivf_indexed_probe_matches_in_plan_ivf(spark, sf_dir, tmp_path):
    # The materialized index (build once, probe via partition-pruned scan)
    # must agree with the index-free in-plan variant given the same
    # deterministic quantizer: same lists probed, same candidates, same
    # top-k.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "ivf_idx")
    cents = similarity.ivf_build(
        emb, "vec_id", "embedding", path, n_centroids=8
    )
    assert len(cents) == 8
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    probe = similarity.ivf_probe_indexed(
        spark, path, cents, "vec_id", "embedding", qvec, k=10, n_probe=4
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    inplan = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=10, n_centroids=8, n_probe=4
    ).collect()
    got = probe.collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in inplan
    ]
    assert got[0].vec_id == 0 and got[0].score == pytest.approx(1.0)
    # the probe must be a partition-pruned scan, not a full pass + filter
    txt = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in txt
    assert any(
        "list_id" in line for line in txt.splitlines() if "PartitionFilters" in line
    ), txt


def test_ivf_indexed_recall_floor_vs_brute_force(spark, tmp_path):
    # Quality pin for the materialized index at the BENCH scale (sf0.1,
    # 2k vectors — read directly so the pin doesn't weaken when the suite
    # runs at sf0.001): mean recall@10 vs exact brute force over several
    # probe queries must clear a floor. The sibling test proves probe ==
    # in-plan IVF; this one stops quantizer drift (training-sample or
    # k-means changes) from silently degrading answer QUALITY while the
    # two variants keep agreeing with each other.
    sf01 = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf01}/embeddings.parquet"):
        pytest.skip("sf0.1 testdata not present")
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "ivf_idx_sf01")
    cents = similarity.ivf_build(emb, "vec_id", "embedding", path, n_centroids=16)
    recalls = []
    for qid in (0, 7, 123, 999, 1500):
        qvec = emb.filter(F.col("vec_id") == qid).first().embedding
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        brute = {
            r.vec_id
            for r in similarity.brute_force_topk(
                emb, "vec_id", "embedding", q, k=10
            ).collect()
        }
        probed = {
            r.vec_id
            for r in similarity.ivf_probe_indexed(
                spark, path, cents, "vec_id", "embedding", qvec, k=10, n_probe=8
            ).collect()
        }
        recalls.append(len(probed & brute) / 10)
    mean_recall = sum(recalls) / len(recalls)
    # This fixture is near-uniform on the sphere (synthetic), the hardest
    # case for IVF — neighbors scatter across lists, so recall tracks the
    # probed fraction. 8/16 lists measures ~0.78 mean here; 0.6 is the
    # drift alarm, not the aspiration. Real embedding corpora cluster and
    # probe far fewer lists for the same recall.
    assert mean_recall >= 0.6, f"IVF index recall@10 degraded: {recalls}"


def test_strip_html_removes_boilerplate_keeps_content(spark):
    html = (
        '<html><head><title>T</title><style>p {x:1}</style>'
        '<script>if (1 < 2) { alert("hi <b>bold</b>"); }</script></head>'
        "<body><nav>menu</nav><p>Real&nbsp;content &amp; more</p>"
        "<!-- hidden --><div>tail</div></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "no markup"), (3, "")], ["id", "t"])
    out = {r.id: r.clean for r in df.select("id", text.strip_html("t").alias("clean")).collect()}
    # script/style contents gone (including the tricky '<' inside script),
    # tags gone, entities decoded, whitespace squeezed
    assert out[1] == "T menu Real content & more tail"
    assert out[2] == "no markup"
    assert out[3] == ""


# --- column profiling -------------------------------------------------------


def test_profile_counts_nulls_distinct_and_mean(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        profile,
    )

    rows = [
        (1, 10.0, "a"),
        (2, None, "b"),
        (3, 30.0, None),
        (4, 10.0, "a"),
    ]
    df = spark.createDataFrame(rows, ["id", "x", "s"])
    p = {r.column: r for r in profile(df).collect()}
    assert set(p) == {"id", "x", "s"}
    assert p["id"].n_rows == 4 and p["id"].n_nulls == 0 and p["id"].n_distinct == 4
    assert p["x"].n_nulls == 1 and p["x"].n_distinct == 2
    assert (p["x"].min_num, p["x"].max_num) == (10.0, 30.0)
    assert abs(p["x"].mean - (50.0 / 3)) < 1e-9  # mean over NON-null only
    assert p["s"].min_str == "a" and p["s"].max_str == "b"
    assert p["s"].min_num is None and p["s"].mean is None


def test_profile_all_null_column_and_subset(spark):
    from pyspark.sql import functions as F
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        profile,
    )

    df = spark.createDataFrame([(1,), (2,)], ["id"]).withColumn(
        "z", F.lit(None).cast("double")
    )
    p = {r.column: r for r in profile(df, columns=["z"]).collect()}
    assert list(p) == ["z"]
    assert p["z"].n_nulls == 2 and p["z"].n_distinct == 0
    assert p["z"].mean is None  # 0/0 must be NULL, not NaN

    import pytest

    with pytest.raises(ValueError, match="no such column"):
        profile(df, columns=["nope"])


def test_profile_approx_mode_single_pass_no_expand(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        profile,
    )

    df = spark.range(1000).selectExpr("id", "id % 7 AS g", "CAST(id AS DOUBLE) AS v")
    exact_plan = (
        profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    approx = profile(df, exact_distinct=False)
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    # exact multi-distinct needs Expand; the HLL path must not
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    p = {r.column: r for r in approx.collect()}
    assert p["g"].n_distinct == 7  # HLL exact at tiny cardinality


def test_histogram_explicit_bounds_and_empty_buckets(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        histogram,
    )

    df = spark.createDataFrame(
        [(0.0,), (1.5,), (9.99,), (10.0,), (4.2,), (-5.0,), (99.0,)], ["v"]
    )
    out = {r.bucket: (r.lo, r.hi, r.n) for r in histogram(df, "v", 5, 0.0, 10.0).collect()}
    assert len(out) == 5  # fixed shape, empty buckets included
    assert out[0] == (0.0, 2.0, 2)   # 0.0, 1.5
    assert out[1] == (2.0, 4.0, 0)   # empty
    assert out[2] == (4.0, 6.0, 1)   # 4.2
    assert out[4] == (8.0, 10.0, 2)  # 9.99 plus hi=10.0 folded in
    # -5.0 and 99.0 dropped (outside range)
    assert sum(n for _, _, n in out.values()) == 5


def test_histogram_data_derived_bounds_and_errors(spark):
    import pytest
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        histogram,
    )

    df = spark.createDataFrame([(10.0,), (20.0,), (30.0,)], ["v"])
    out = histogram(df, "v", 2).collect()
    assert out[0].lo == 10.0 and out[-1].hi == 30.0
    assert sum(r.n for r in out) == 3
    with pytest.raises(ValueError, match="bins"):
        histogram(df, "v", 0)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram(df, "v", 4, lo=5.0, hi=5.0)


def test_corr_matrix_known_values_and_nulls(spark):
    import math
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.profile import (
        corr_matrix,
    )

    rows = [
        (1.0, 2.0, 5.0),
        (2.0, 4.0, 4.0),
        (3.0, 6.0, 3.0),
        (4.0, 8.0, None),  # pairwise-complete: (a,c) drops this row
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    out = {(r.col_x, r.col_y): r for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")].n == 4 and abs(out[("a", "b")].corr - 1.0) < 1e-12
    assert out[("a", "c")].n == 3 and abs(out[("a", "c")].corr - (-1.0)) < 1e-12
    # zero variance -> NULL, not inf/NaN
    dfz = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], ["x", "y"])
    z = corr_matrix(dfz, ["x", "y"]).collect()[0]
    assert z.corr is None

    import pytest

    with pytest.raises(ValueError, match="at least two"):
        corr_matrix(df, ["a"])


def test_jpeg_roundtrip_block_constant_exact():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    for _ in range(4):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        blocks = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        d = decode_jpeg(encode_jpeg(img))
        # Flat quantization + constant blocks: DC-only spectra survive
        # integer rounding, so the round trip is bit-exact.
        assert d["channels"] == 1
        assert (d["height"], d["width"]) == img.shape
        assert np.array_equal(d["pixels"], img)
        assert d["pixel_sum"] == int(img.sum(dtype=np.int64))


def test_jpeg_roundtrip_lossy_bounds_and_odd_dims():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    # Arbitrary content: REAL lossy DCT behavior, error bounded by the
    # flat quant=1 rounding (a fake decoder would be either exact or way
    # off). Odd dimensions exercise edge padding + crop.
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert (d["height"], d["width"]) == (13, 21)
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 3
    # 3-component color: YCbCr round trip within quantization+rounding.
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(rgb))
    assert d["channels"] == 3
    assert np.abs(d["pixels"].astype(int) - rgb.astype(int)).max() <= 6
    # Gray-valued RGB has constant chroma 128: color path is exact on
    # block-constant content.
    v = np.kron(rng.integers(0, 256, (2, 2)), np.ones((8, 8))).astype(np.uint8)
    rgb = np.stack([v, v, v], axis=-1)
    d = decode_jpeg(encode_jpeg(rgb))
    assert np.array_equal(d["pixels"], rgb)


def test_jpeg_decoder_rejects_unsupported_profiles():
    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # Progressive SOF2 is honestly refused, not mis-decoded.
    payload = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with _pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(payload))


def test_mjpeg_avi_roundtrip_and_handler_guard():
    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        demux_avi,
        encode_avi_mjpeg,
    )

    frames, expect = [], []
    for fn in range(3):
        blocks = np.array([[(11 * fn + 13 * j) % 256 for j in range(2)]], dtype=np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        frames.append(img)
        expect.append(int(img.sum()))
    d = demux_avi(encode_avi_mjpeg(frames, fps=12))
    assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (16, 8, 12, 3)
    assert [f["pixel_sum"] for f in d["frames"]] == expect
    # An unknown compressed handler is refused, not silently mis-decoded.
    payload = bytearray(encode_avi_mjpeg(frames))
    idx = payload.find(b"MJPG")  # strh fccHandler (first occurrence)
    payload[idx : idx + 4] = b"H264"
    with _pytest.raises(NotImplementedError, match="MJPG only"):
        demux_avi(bytes(payload))


def test_wav_mulaw_and_pcm8_decode():
    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_wav,
        encode_wav_mulaw,
    )
    import struct

    # μ-law: constant codes decode per the ITU-T formula.
    for b in (0, 1, 127, 128, 200, 255):
        d = decode_wav(encode_wav_mulaw(np.full(10, b, dtype=np.uint8), 8000))
        u = (~np.uint8(b)) & 0xFF
        mag = (((int(u & 0x0F) << 3) + 0x84) << int((u >> 4) & 7)) - 0x84
        assert d["abs_sum"] == 10 * mag
        # Sign bit: u & 0x80 set → non-positive samples (zero magnitude
        # codes decode to 0 on either sign).
        assert (d["samples"] <= 0).all() if (u & 0x80) else (d["samples"] >= 0).all()
    # PCM8: unsigned with 128 bias.
    data = bytes([0, 128, 255])
    pcm8 = (
        struct.pack("<4sI4s", b"RIFF", 36 + 3, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
        + struct.pack("<4sI", b"data", 3)
        + data
    )
    d = decode_wav(pcm8)
    assert list(d["samples"]) == [-128, 0, 127]
    # A-law (format 6): CCITT alaw2linear reference values.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        encode_wav_alaw,
    )

    def alaw_ref(code):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    for b in (0, 0x55, 0x2A, 0xD5, 0xFF, 0x80, 0x13):
        d = decode_wav(encode_wav_alaw(np.full(5, b, dtype=np.uint8), 8000))
        assert list(d["samples"]) == [alaw_ref(b)] * 5, hex(b)
    # Truly unsupported formats still refused (IEEE float = format 3).
    f32 = pcm8.replace(
        struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8),
        struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 8000, 1, 8),
    )
    with _pytest.raises(NotImplementedError):
        decode_wav(f32)


def test_jpeg_decoder_malformed_payloads_raise_value_error():
    import random

    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(5)
    img = np.kron(np.array([[7, 200]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8))
    good = encode_jpeg(img)
    for _ in range(120):
        b = bytearray(good)
        k = rng.randrange(3)
        if k == 0:
            b = b[: rng.randrange(2, len(b))]
        elif k == 1:
            b[rng.randrange(2, len(b))] = rng.randrange(256)
        else:
            i = rng.randrange(2, len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(len(b) - i))
        try:
            decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # the only acceptable failure modes
        # Decoding "successfully" with wrong pixels is fine (entropy-bit
        # flips do that in every real decoder); crashing with an index/
        # struct error is not.


def test_all_decoders_malformed_payloads_raise_value_error():
    import random

    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    rng = random.Random(11)
    cases = {
        "bmp": (M.encode_bmp(np.full((5, 7, 3), 9, dtype=np.uint8)), M.decode_bmp),
        "png": (M.encode_png(np.full((5, 7, 3), 9, dtype=np.uint8)), M.decode_png),
        "gif": (M.encode_gif(np.zeros((5, 7), dtype=np.uint8)), M.decode_gif),
        "wav": (M.encode_wav(np.array([1, -2, 3], dtype=np.int16), 8000), M.decode_wav),
        "avi": (M.encode_avi([np.full((8, 8, 3), 5, dtype=np.uint8)]), M.demux_avi),
    }
    for name, (good, dec) in cases.items():
        for _ in range(150):
            b = bytearray(good)
            k = rng.randrange(3)
            if k == 0:
                b = b[: rng.randrange(2, len(b))]
            elif k == 1:
                b[rng.randrange(2, len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(2, len(b))
                b = b[:i] + bytes(rng.randrange(256) for _ in range(len(b) - i))
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass  # the only acceptable failure modes


def test_tiff_roundtrip_and_guards():
    import random
    import struct

    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(3)
    for shape in [(5, 7, 3), (4, 9), (1, 1, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        d = decode_tiff(encode_tiff(img))
        assert np.array_equal(d["pixels"], img)
        assert d["channels"] == (1 if len(shape) == 2 else 3)
        assert d["pixel_sum"] == int(img.sum(dtype=np.int64))
    # Compressed TIFFs refused honestly.
    payload = bytearray(encode_tiff(np.zeros((4, 4), dtype=np.uint8)))
    i = payload.find(struct.pack("<HH", 259, 3))
    payload[i + 8] = 5  # LZW
    with _pytest.raises(NotImplementedError, match="compressed TIFF"):
        decode_tiff(bytes(payload))
    # Malformed payloads raise clean ValueErrors (guard applies).
    pyrng = random.Random(9)
    good = encode_tiff(rng.integers(0, 256, (6, 6, 3)).astype(np.uint8))
    for _ in range(100):
        b = bytearray(good)
        k = pyrng.randrange(2)
        if k == 0:
            b = b[: pyrng.randrange(2, len(b))]
        else:
            b[pyrng.randrange(2, len(b))] = pyrng.randrange(256)
        try:
            decode_tiff(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_webp_lossless_roundtrip_and_guards():
    import random

    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.multimodal import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(5)
    for _ in range(4):
        h, w = int(rng.integers(1, 10)), int(rng.integers(1, 12))
        vals = rng.integers(0, 256, (3, 2)).astype(np.uint8)
        img = np.stack(
            [vals[c][rng.integers(0, 2, (h, w))] for c in range(3)], axis=-1
        )
        d = decode_webp_lossless(encode_webp_lossless(img))
        assert (d["height"], d["width"]) == (h, w)
        assert np.array_equal(d["pixels"], img)
    # Constant image: one-symbol codes, zero bits per pixel.
    img = np.full((6, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_webp_lossless(encode_webp_lossless(img))["pixels"], img
    )
    # Outside-profile features refuse honestly.
    with _pytest.raises(ValueError, match="at most 2 values"):
        encode_webp_lossless(np.arange(27, dtype=np.uint8).reshape(3, 3, 3))
    with _pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp_lossless(b"not a webp")
    # Lossy VP8 chunks are refused, not mis-decoded.
    lossy = bytearray(encode_webp_lossless(img))
    lossy[12:16] = b"VP8 "
    with _pytest.raises(NotImplementedError, match="lossless"):
        decode_webp_lossless(bytes(lossy))
    # Malformed payloads raise clean errors (guard + truncation).
    pyrng = random.Random(4)
    good = encode_webp_lossless(img)
    for _ in range(100):
        b = bytearray(good)
        if pyrng.randrange(2):
            b = b[: pyrng.randrange(2, len(b))]
        else:
            b[pyrng.randrange(2, len(b))] = pyrng.randrange(256)
        try:
            decode_webp_lossless(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_decode_image_routes_all_real_formats():
    import numpy as np
    import pytest as _pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    img3 = np.full((4, 6, 3), 9, dtype=np.uint8)
    for enc in (
        M.encode_bmp,
        M.encode_png,
        M.encode_tiff,
        M.encode_jpeg,
        M.encode_webp_lossless,
    ):
        d = M.decode_image(enc(img3))
        assert (d["width"], d["height"]) == (6, 4), enc.__name__
    d = M.decode_image(M.encode_gif(np.zeros((4, 6), dtype=np.uint8)))
    assert (d["width"], d["height"]) == (6, 4)
    with _pytest.raises(NotImplementedError, match="unrecognized"):
        M.decode_image(b"\x00\x01unknown")


# -- weighted sampling (round-8) ---------------------------------------------


def test_weighted_sample_matches_exact_replay(spark, sf_dir):
    # The A-ES draw is a pure function of (id, salt): replay the exact
    # md5 → uniform → ln(u)/w rank in plain Python and demand the same set.
    import hashlib
    import math

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (
        weighted_sample,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    docs = load(spark, sf_dir, "documents")
    got = [
        r["doc_id"]
        for r in weighted_sample(docs, "n_chars", "doc_id", 20).collect()
    ]
    rows = docs.select("doc_id", "n_chars").collect()
    keyed = []
    for r in rows:
        if r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(f"aes|{r['doc_id']}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        keyed.append((math.log(u) / float(r["n_chars"]), -r["doc_id"], r["doc_id"]))
    keyed.sort(reverse=True)
    want = [d for _, _, d in keyed[:20]]
    assert sorted(got) == sorted(want)


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # Rows weighted 50x should dominate the sample: with 100 heavy and
    # 900 light rows carrying ~85% of the total mass, a k=100 draw picks
    # mostly heavy rows; a uniform draw would pick ~10.
    from pyspark.sql import functions as F

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (
        weighted_sample,
    )

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 100, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    heavy = (
        weighted_sample(df, "w", "id", 100)
        .filter(F.col("id") < 100)
        .count()
    )
    assert heavy >= 60, heavy  # E[heavy] ≈ 85; 60 is > 6 sigma below


def test_weighted_sample_salt_and_validation(spark):
    from pyspark.sql import functions as F
    import pytest

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (
        weighted_sample,
    )

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = {r["id"] for r in weighted_sample(df, "w", "id", 50, salt="a").collect()}
    b = {r["id"] for r in weighted_sample(df, "w", "id", 50, salt="b").collect()}
    assert a != b  # independent draws
    # zero/negative weights are excluded entirely
    z = df.withColumn("w", F.when(F.col("id") < 490, 0.0).otherwise(-1.0))
    assert weighted_sample(z, "w", "id", 50).count() == 0
    # k larger than the population returns every positive-weight row
    assert weighted_sample(df, "w", "id", 10_000).count() == 500
    with pytest.raises(ValueError):
        weighted_sample(df, "w", "id", 0)


def test_weighted_sample_per_group_quota_and_replay(spark, sf_dir):
    import hashlib
    import math
    from collections import defaultdict

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (
        weighted_sample_per_group,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    docs = load(spark, sf_dir, "documents")
    got = weighted_sample_per_group(docs, "source", "n_chars", "doc_id", 5)
    rows = got.collect()
    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append(r["doc_id"])
    # quota: exactly min(5, group size) per stratum
    sizes = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    for src, cnt in sizes.items():
        assert len(per[src]) == min(5, cnt), (src, len(per[src]))
    # exact replay of the per-group draw in plain Python
    keyed = defaultdict(list)
    for r in docs.select("doc_id", "source", "n_chars").collect():
        h = int(hashlib.md5(f"aes|{r['doc_id']}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        keyed[r["source"]].append(
            (math.log(u) / float(r["n_chars"]), -r["doc_id"], r["doc_id"])
        )
    for src, lst in keyed.items():
        lst.sort(reverse=True)
        assert sorted(d for _, _, d in lst[:5]) == sorted(per[src]), src


def test_ivf_pq_topk_recall_and_determinism(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        similarity,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    got = similarity.ivf_pq_topk(
        emb, "vec_id", "embedding", q, dim=64, k=10, n_probe=6
    ).collect()
    # self-match survives both pruning stages, scores are exact floats
    assert got[0].vec_id == 7 and got[0].score == pytest.approx(1.0)
    # The PQ stage must not lose what IVF kept: vs ivf_topk with the SAME
    # coarse parameters, the composed result recovers ≥0.9 (ADC + exact
    # rescore is near-exact inside the pruned set).
    ivf_only = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=10, n_centroids=16, n_probe=6
    ).collect()
    vs_ivf = len({r.vec_id for r in got} & {r.vec_id for r in ivf_only}) / 10
    assert vs_ivf >= 0.9, vs_ivf
    # vs brute force, recall is bounded by the coarse pruning (same ≥0.5
    # contract the plain-IVF pin uses at half-probe).
    recall = len({r.vec_id for r in got} & {r.vec_id for r in brute}) / 10
    assert recall >= 0.5, recall
    # Full probe removes the pruning: recall must reach the PQ pin.
    full = similarity.ivf_pq_topk(
        emb, "vec_id", "embedding", q, dim=64, k=10,
        n_centroids=16, n_probe=16,
    ).collect()
    recall_full = len({r.vec_id for r in full} & {r.vec_id for r in brute}) / 10
    assert recall_full >= 0.9, recall_full
    again = similarity.ivf_pq_topk(
        emb, "vec_id", "embedding", q, dim=64, k=10, n_probe=6
    ).collect()
    assert [r.vec_id for r in again] == [r.vec_id for r in got]


def test_ivf_pq_residual_coding_tightens_adc_on_clustered_data(spark):
    """Round-9: residual-coded IVFPQ (Jégou et al. 2011 §IV) — pin the
    regime the lever is FOR. On clustered corpora (the real-world shape)
    residual codebooks quantize measurably finer than raw-vector ones:
    ADC error shrinks and the worst true-top-10 candidate ranks higher
    in the ADC ordering (so a smaller rescore tail suffices). On the
    near-uniform synthetic embeddings fixture residuals are NOT smaller
    (mean ||v - c|| = 1.26 > 1 with 16 lists in 64-dim), and raw coding
    measures mildly better — both measurements recorded in BASELINE.md;
    the exact-rescore tail absorbs the difference either way."""
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        similarity as S,
    )

    rng = np.random.RandomState(0)
    dim, n_clusters, per = 64, 16, 128
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per, axis=0) + 0.08 * rng.randn(n_clusters * per, dim)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    cent = np.array(S._train_centroids(df, "vec_id", "embedding", 512, 16, 8, 42))
    assign = (X @ cent.T).argmax(1)
    assert np.linalg.norm(X - cent[assign], axis=1).mean() < 0.7  # clustered
    q = X[7]
    exact = X @ q
    stats = {}
    for residual in (False, True):
        cbs = [
            np.asarray(c)
            for c in S.pq_train(
                df, "vec_id", "embedding", dim, m=16, k_codes=32,
                centroids=cent if residual else None,
            )
        ]
        base = X - cent[assign] if residual else X
        codes = np.stack(
            [
                np.argmax(base[:, j * 4:(j + 1) * 4] @ cb.T - 0.5 * (cb * cb).sum(1), axis=1)
                for j, cb in enumerate(cbs)
            ],
            axis=1,
        )
        adc = np.zeros(len(X))
        for j, cb in enumerate(cbs):
            adc += (q[j * 4:(j + 1) * 4] @ cb.T)[codes[:, j]]
        if residual:
            adc += (cent @ q)[assign]
        rank = np.argsort(np.argsort(-adc))
        true10 = np.argsort(-exact)[:10]
        stats[residual] = (np.abs(adc - exact).mean(), rank[true10].max())
    # residual ADC is tighter AND ranks the true candidates higher
    assert stats[True][0] < stats[False][0], stats
    assert stats[True][1] < stats[False][1], stats
    # measured at seed 0: err 0.042 -> 0.028, worst-rank 92 -> 47; leave
    # slack for BLAS noise but pin the ~1.3x+ improvement
    assert stats[True][0] < 0.85 * stats[False][0], stats
    # end-to-end: the residual path returns the exact self-match first
    qdf = spark.createDataFrame([(X[7].tolist(),)], "q array<double>")
    got = S.ivf_pq_topk(df, "vec_id", "embedding", qdf, dim=64, k=5, n_probe=16).collect()
    assert got[0].vec_id == 7 and abs(got[0].score - 1.0) < 1e-6


def test_feature_scalers(spark):
    """Round-9 feature-scaling trio: per-group fit state broadcast onto
    rows; degenerate groups (IQR/stddev/range = 0) scale to NULL, never
    a divide-by-zero."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        features,
    )

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 5.0)],
        ["g", "v"],
    )
    mm = {
        (r.g, r.v): r.scaled
        for r in features.minmax_scale(df, "v", ["g"]).collect()
    }
    assert mm[("a", 0.0)] == 0.0 and mm[("a", 20.0)] == 1.0
    assert mm[("a", 10.0)] == 0.5
    assert mm[("b", 5.0)] is None  # constant group -> NULL, not a crash
    zs = {
        (r.g, r.v): r.scaled
        for r in features.zscore_scale(df, "v", ["g"]).collect()
    }
    assert zs[("a", 10.0)] == 0.0 and zs[("a", 20.0)] == 1.0  # sd = 10
    assert zs[("b", 5.0)] is None  # zero stddev
    rb = {
        (r.g, r.v): r.scaled
        for r in features.robust_scale(df, "v", ["g"]).collect()
    }
    # a: median 10, IQR = 15 - 5 = 10 -> (20-10)/10 = 1.0
    assert rb[("a", 20.0)] == 1.0 and rb[("a", 10.0)] == 0.0
    assert rb[("b", 5.0)] is None
    # global (ungrouped) mode
    g = features.minmax_scale(df, "v").select("v", "scaled").collect()
    assert {r.v: r.scaled for r in g}[20.0] == 1.0


def test_ivf_topk_batch_partial_probe_and_plan(spark, sf_dir):
    """Round-9 batched-query ANN: per-query recall at partial probe
    matches the single-query ivf_topk contract, and the plan never
    materializes a query x corpus cross product."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        similarity,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.inspect import (
        plan_text,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    batch = similarity.ivf_topk_batch(
        emb, "vec_id", "embedding", queries, "qid", "qv",
        k=10, n_centroids=16, n_probe=6,
    )
    txt = plan_text(batch)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    rows = batch.collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append(r.vec_id)
    assert set(got) == {0, 1, 2, 3}
    for qid, ids in got.items():
        # self-match survives pruning (its own list is always probed)
        assert ids[0] == qid, (qid, ids)
        # batch result == single-query ivf_topk with identical params
        q1 = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        single = [
            r.vec_id
            for r in similarity.ivf_topk(
                emb, "vec_id", "embedding", q1, k=10,
                n_centroids=16, n_probe=6,
            ).collect()
        ]
        assert ids == single, (qid, ids, single)


def test_ivf_multi_assignment_raises_partial_probe_recall(spark, sf_dir):
    """Round-10: IVF multi-assignment (n_assign=2 — each vector spills to
    its 2 nearest lists) must (a) never emit duplicate ids, (b) keep the
    self-hit at rank 1, and (c) dominate single-assignment recall on the
    same partial probe across queries. The round-9 A/B showed partial-
    probe recall is IVF-pruning-bound with no code-side lever; list-spill
    is the standard one (at 2x storage)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    r1_total = r2_total = 0.0
    for qid in (0, 3, 7, 11):
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        brute = {
            r.vec_id
            for r in similarity.brute_force_topk(
                emb, "vec_id", "embedding", q, k=10
            ).collect()
        }
        a1 = similarity.ivf_topk(
            emb, "vec_id", "embedding", q, k=10,
            n_centroids=8, n_probe=3, n_assign=1,
        ).collect()
        a2 = similarity.ivf_topk(
            emb, "vec_id", "embedding", q, k=10,
            n_centroids=8, n_probe=3, n_assign=2,
        ).collect()
        ids2 = [r.vec_id for r in a2]
        assert len(ids2) == len(set(ids2)), "duplicate ids leaked through"
        assert a2[0].vec_id == qid and a2[0].score == pytest.approx(1.0)
        r1_total += len({r.vec_id for r in a1} & brute) / 10
        r2_total += len(set(ids2) & brute) / 10
    assert r2_total >= r1_total, (
        f"multi-assignment recall {r2_total/4:.2f} fell below "
        f"single-assignment {r1_total/4:.2f}"
    )
    # the pin the round-9 A/B could not reach: partial probe (3/8 lists)
    # with spill holds recall@10 >= 0.6 on average
    assert r2_total / 4 >= 0.6, f"spilled recall@10 too low: {r2_total/4:.2f}"


def test_ivf_multi_assignment_full_probe_exact_and_batch(spark, sf_dir):
    """Full probe over a spilled corpus is still EXACT (dedup collapses
    the copies), for both the single-query and batched operators."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("q"))
    brute = similarity.brute_force_topk(
        emb, "vec_id", "embedding", q, k=8
    ).collect()
    ivf = similarity.ivf_topk(
        emb, "vec_id", "embedding", q, k=8,
        n_centroids=8, n_probe=8, n_assign=2,
    ).collect()
    assert [r.vec_id for r in ivf] == [r.vec_id for r in brute]
    queries = emb.filter(F.col("vec_id").isin([3, 7])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    batch = similarity.ivf_topk_batch(
        emb, "vec_id", "embedding", queries, "qid", "qv",
        k=5, n_centroids=8, n_probe=8, n_assign=2,
    ).collect()
    for qid in (3, 7):
        got = [r.vec_id for r in batch if r.qid == qid]
        assert len(got) == len(set(got)) == 5
        assert got[0] == qid


def test_multiassign_recall_workload_floor(spark, sf_dir):
    """Round-11 (verdict #6): the driver-visible partial-probe recall
    workload must hold mean recall@10 >= 0.9 at probe=6/16 with the
    3x-spilled corpus (measured 0.94/0.96/0.96 at sf0.001/0.01/0.1), and
    dominate single-assignment at the same probe — the SEARCH-side value
    of multi-assignment, not just the dedup correctness."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.scale import (
        ann_multiassign_recall,
    )

    rows = ann_multiassign_recall(spark, sf_dir).collect()
    assert [r.qid for r in rows] == list(range(8))
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.9, f"spilled partial-probe mean recall {mean:.3f} < 0.9"
    assert all(r.n_hit == round(r.recall * 10) for r in rows)
    # dominance: the same probe WITHOUT spill must not beat the workload
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    single = similarity.ivf_topk_batch(
        emb, "vec_id", "embedding", queries, "qid", "qv",
        k=10, n_centroids=16, n_probe=6, n_assign=1,
    )
    from pyspark.sql import Window as W

    scored = emb.crossJoin(F.broadcast(queries)).select(
        "qid", "vec_id",
        F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 6).alias("score"),
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    n_single = exact.join(
        single.select("qid", "vec_id"), ["qid", "vec_id"], "left_semi"
    ).count()
    assert mean >= n_single / 80, "spill failed to dominate single-assignment"


def test_matryoshka_truncation_self_hit_and_shape(spark, sf_dir):
    """Round-11: truncated-dimension (matryoshka) scoring — the self-hit
    must stay rank 1 at score 1.0 (cosine of identical truncated vectors),
    every query returns exactly 10 rows, and truncated scores differ from
    full-dim scores (the truncation actually bites). No recall floor by
    design: the synthetic isotropic fixture has no MRL head structure."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.scale import (
        ann_matryoshka_top10,
    )

    rows = ann_matryoshka_top10(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert sorted(by_q) == [0, 1, 2, 3]
    for qid, rs in by_q.items():
        assert len(rs) == 10
        assert rs[0].vec_id == qid and rs[0].score == pytest.approx(1.0)
    # truncation bites: the 16-dim neighbor sets differ from full-dim
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    full = [
        r.vec_id
        for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q0, k=10).collect()
    ]
    trunc = [r.vec_id for r in by_q[0]]
    assert trunc != full


def test_hard_negatives_exclude_same_label(spark, sf_dir):
    """Round-11: every mined hard negative must carry a label different
    from its query's label, and be among the closest such vectors."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.scale import (
        ann_hard_negatives,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = ann_hard_negatives(spark, sf_dir).collect()
    assert len(rows) == 20  # 4 queries x top-5
    for r in rows:
        assert labels[r.vec_id] != labels[r.qid]
        assert r.vec_id != r.qid  # self always shares its own label


def test_skew_report_shape_and_math(spark):
    """Round-11: skew_report surfaces the hot key with exact share/ratio
    arithmetic, orders heaviest-first, respects top_k, and rejects empty
    key lists."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        skew,
    )

    rows = [("hot", i) for i in range(90)] + [
        (f"k{i}", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    rep = skew.skew_report(df, ["k"], top_k=3).collect()
    assert [r.k for r in rep][0] == "hot" and len(rep) == 3
    assert rep[0].n == 90
    assert rep[0].share == pytest.approx(0.9)
    # 11 distinct keys, mean weight 100/11 => ratio 90*11/100
    assert rep[0].ratio_vs_mean == pytest.approx(90 * 11 / 100)
    with pytest.raises(ValueError, match="at least one key"):
        skew.skew_report(df, [])
