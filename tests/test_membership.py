"""Bloom-filter membership operator (operators/membership.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    membership,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.inspect import (
    plan_text,
    shuffle_count,
)


def _py_positions(key: str, m_bits: int, k: int) -> list[int]:
    h = hashlib.md5(key.encode()).hexdigest()
    h1 = int(h[0:15], 16) % m_bits
    h2 = int(h[15:30], 16) % m_bits
    return [(h1 + i * h2) % m_bits for i in range(k)]


def test_bloom_positions_match_reference_hash(spark):
    keys = ["", "a", "key1", "the quick brown fox", "αβγ"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r.k: list(r.p)
        for r in df.select(
            "k", membership.bloom_positions(F.col("k"), 1 << 14, 4).alias("p")
        ).collect()
    }
    for k in keys:
        assert got[k] == _py_positions(k, 1 << 14, 4), k


def test_bloom_no_false_negatives_and_low_fp(spark):
    keys = spark.createDataFrame([(f"key{i}",) for i in range(1000)], ["k"])
    bf = membership.bloom_build(keys, "k", m_bits=1 << 14, k=4)
    assert 0 < bf.n_set_bits <= 4000
    misses = (
        keys.select(membership.bloom_contains(F.col("k"), bf).alias("hit"))
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0  # bloom filters never have false negatives
    absent = spark.createDataFrame([(f"other{i}",) for i in range(2000)], ["k"])
    fp = (
        absent.select(membership.bloom_contains(F.col("k"), bf).alias("hit"))
        .filter("hit")
        .count()
    )
    # theoretical fp ≈ (1 - e^{-kn/m})^4 ≈ 0.2% here; allow generous slack
    assert fp / 2000 < 0.02


def test_bloom_probe_is_shuffle_free_and_udf_free(spark):
    keys = spark.createDataFrame([(f"key{i}",) for i in range(100)], ["k"])
    bf = membership.bloom_build(keys, "k", m_bits=1 << 10, k=3)
    probe = spark.range(1000).select(
        membership.bloom_contains(F.concat(F.lit("x"), F.col("id")), bf).alias("hit")
    )
    assert shuffle_count(probe) == 0
    txt = plan_text(probe)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_bloom_gram_audit_counts(spark):
    keys = spark.createDataFrame([("alpha",), ("beta",)], ["k"])
    bf = membership.bloom_build(keys, "k", m_bits=1 << 12, k=3)
    docs = spark.createDataFrame(
        [(1, ["alpha", "beta", "zzz", "alpha"]), (2, ["qqq"])],
        ["id", "grams"],
    )
    rows = {
        r.id: r
        for r in membership.bloom_gram_audit(docs, "id", "grams", bf).collect()
    }
    # duplicates collapse (array_distinct) before counting
    assert rows[1].n_grams == 3 and rows[1].n_hits == 2 and rows[1].contaminated
    assert rows[2].n_grams == 1 and rows[2].n_hits == 0 and not rows[2].contaminated


def test_bloom_build_rejects_bad_m():
    with pytest.raises(ValueError, match="multiple of 64"):
        membership.bloom_build(None, "k", m_bits=100)


# --- hashed-NB classifier (operators/text.py round-7) ----------------------


def test_nb_classifier_separates_planted_labels(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text as text_ops,
    )

    pos_doc = ["apple", "banana", "cherry"]
    neg_doc = ["xray", "yankee", "zulu"]
    rows = [(i, pos_doc, True) for i in range(20)] + [
        (i + 100, neg_doc, False) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id LONG, toks ARRAY<STRING>, lbl BOOLEAN")
    w = text_ops.nb_train_token_logodds(df, "toks", "lbl", n_buckets=64)
    assert len(w) == 64
    scored = df.select(
        "id", "lbl", text_ops.nb_score_tokens(F.col("toks"), w).alias("s")
    ).collect()
    for r in scored:
        assert (r.s > 0) == r.lbl, (r.id, r.s)


def test_nb_scoring_is_shuffle_free(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text as text_ops,
    )

    w = [0.1] * 64
    probe = spark.range(100).select(
        F.array(F.lit("a"), F.lit("b")).alias("toks")
    ).select(text_ops.nb_score_tokens(F.col("toks"), w).alias("s"))
    assert shuffle_count(probe) == 0
    txt = plan_text(probe)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


# --- sliding-window chunking (operators/text.py round-7) -------------------


def test_chunk_documents_boundaries_and_overlap(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text as text_ops,
    )

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")], ["id", "t"])
    out = text_ops.chunk_documents(df, "id", "t", chunk_tokens=32, overlap=8)
    rows = sorted(out.collect(), key=lambda r: (r.id, r.chunk_id))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    # doc 1: starts 1,25,49,73 (a start at 97 would add no uncovered
    # tokens — no redundant tail chunk); final chunk clips short
    d1 = by_doc[1]
    assert [c.chunk_id for c in d1] == [0, 1, 2, 3]
    assert [c.n_chunk_tokens for c in d1] == [32, 32, 32, 28]
    # consecutive chunks share exactly `overlap` tokens
    t0, t1 = d1[0].chunk_text.split(" "), d1[1].chunk_text.split(" ")
    assert t0[-8:] == t1[:8]
    # no token dropped: strided reassembly reproduces the doc
    reassembled = t0 + [
        w for c in d1[1:] for w in c.chunk_text.split(" ")[8:]
    ]
    assert reassembled == words.split(" ")
    # short doc → one chunk with all tokens; empty doc → one (empty) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert len(by_doc[3]) == 1


def test_chunk_documents_validation_and_plan(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text as text_ops,
    )

    df = spark.createDataFrame([(1, "a b c")], ["id", "t"])
    with pytest.raises(ValueError, match="overlap"):
        text_ops.chunk_documents(df, "id", "t", chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="chunk_tokens"):
        text_ops.chunk_documents(df, "id", "t", chunk_tokens=0)
    out = text_ops.chunk_documents(df, "id", "t", chunk_tokens=4, overlap=1)
    assert shuffle_count(out) == 0
    txt = plan_text(out)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


# --- temperature mixing (operators/packing.py round-7) ---------------------


def test_temperature_mix_flattens_distribution(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        temperature_mix,
    )

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    kept = temperature_mix(df, "grp", "id", tau=0.5, target_frac=0.5)
    by = {r.grp: r.n for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # tau=0.5 shares: w_big=30, w_small=10 → big 375, small kept fully
    # (125 desired > 100 available → rate caps at 1.0).
    assert by["small"] == 100
    assert 300 < by["big"] < 450
    # deterministic: identical rerun keeps the identical id set
    k1 = sorted(r.id for r in kept.collect())
    k2 = sorted(
        r.id for r in temperature_mix(df, "grp", "id", tau=0.5, target_frac=0.5).collect()
    )
    assert k1 == k2
    # tau=1 keeps the natural distribution: every group's rate equals
    # target_frac, so big's keep fraction ~0.5
    nat = temperature_mix(df, "grp", "id", tau=1.0, target_frac=0.5)
    byn = {r.grp: r.n for r in nat.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert 350 < byn["big"] < 550 and 30 < byn["small"] < 70

    with pytest.raises(ValueError, match="tau"):
        temperature_mix(df, "grp", "id", tau=0)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix(df, "grp", "id", target_frac=0)


# --- perceptual image hashing (round-7) -------------------------------------


def test_phash_invariances_and_separation():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (48, 64, 3)).astype("uint8")

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h = M.phash64(img)
    # re-encoding through BMP AND PNG must preserve the hash exactly
    assert ham(h, M.phash64(M.decode_bmp(M.encode_bmp(img))["pixels"])) == 0
    assert ham(h, M.phash64(M.decode_png(M.encode_png(img))["pixels"])) == 0
    # global brightness shift: invariant (median over non-DC coefficients)
    bright = np.clip(img.astype(int) + 40, 0, 255).astype("uint8")
    assert ham(h, M.phash64(bright)) == 0
    # small noise: close; different random image: far
    noisy = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape), 0, 255)
    assert ham(h, M.phash64(noisy.astype("uint8"))) <= 8
    other = rng.integers(0, 256, (48, 64, 3)).astype("uint8")
    assert ham(h, M.phash64(other)) > 16
    # tiny images run through the upscale path deterministically
    small = rng.integers(0, 256, (5, 7, 3)).astype("uint8")
    assert M.phash64(small) == M.phash64(small)


def test_hamming_pairs_matches_brute_force(spark):
    import itertools

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        hamming_pairs,
    )

    hashes = [0, 1, 3, 1 << 40, (1 << 40) | 7, -1, -2, 12345]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id LONG, h LONG"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs(df, "id", "h", max_hamming=3).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            want[(i, j)] = d
    assert got == want


def _phash_neardup_pipeline(spark, sf_dir):
    """The retired multimodal_phash_neardup workload's pipeline, kept as
    the OPERATOR-level pin per its round-14 retirement note (the driver
    row was swapped for refsql_scalar_family; crossmodal_image_text_
    neardup carries the same pHash+hamming composition in the gate):
    per-doc sinusoid images, every 10th doc a noise twin, BMP/PNG
    alternating encodings, phash64, pigeonhole Hamming pairs."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        hamming_pairs,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        load,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id").limit(400)

    def encode(it):
        import numpy as np
        import pandas as pd

        def img_for(did, noise_seed):
            y, x = np.mgrid[0:40, 0:40]
            prng = np.random.default_rng(1_234_567 + did)
            g = np.full((40, 40), 128.0)
            for _ in range(3):
                fx, fy = prng.uniform(0.5, 3.5, 2)
                p1, p2 = prng.uniform(0, 2 * np.pi, 2)
                amp = prng.uniform(25, 45)
                g = g + amp * np.sin(
                    2 * np.pi * fx * x / 40 + p1
                ) * np.cos(2 * np.pi * fy * y / 40 + p2)
            if noise_seed is not None:
                rng = np.random.default_rng(noise_seed)
                g = g + rng.integers(-3, 4, g.shape)
            g = np.clip(g, 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)

        for pdf in it:
            out = {"media_id": [], "payload": []}
            for did in pdf["doc_id"].astype("int64"):
                px = img_for(did, None)
                enc = (
                    multimodal.encode_bmp
                    if did % 2 == 0
                    else multimodal.encode_png
                )
                out["media_id"].append(did)
                out["payload"].append(enc(px))
                if did % 10 == 0:
                    twin = img_for(did, noise_seed=did + 1)
                    tenc = (
                        multimodal.encode_png
                        if did % 2 == 0
                        else multimodal.encode_bmp
                    )
                    out["media_id"].append(did + 1_000_000)
                    out["payload"].append(tenc(twin))
            yield pd.DataFrame(out)

    raw = docs.mapInPandas(encode, schema="media_id long, payload binary")
    media = multimodal.wrap_binary(raw, "media_id", "payload", "image")
    hashes = multimodal.extract_image_phash(media)
    return hamming_pairs(
        hashes, "media_id", "phash", max_hamming=6
    ).orderBy("id_a", "id_b")


def test_phash_neardup_workload_recall(spark, sf_dir):
    rows = _phash_neardup_pipeline(spark, sf_dir).collect()
    planted = [r for r in rows if r.id_b == r.id_a + 1_000_000]
    extras = [r for r in rows if r.id_b != r.id_a + 1_000_000]
    assert len(planted) == 40  # every 10th of 400 docs gets a twin
    assert len(extras) == 0
    assert all(r.hamming <= 6 for r in planted)


def test_crossmodal_neardup_joint_vote(spark, sf_dir):
    # Round-8: the joint image+text vote keeps every FULL twin (both
    # modalities near) and rejects every single-modality plant — the
    # property that makes the composition stricter than either primitive.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
        load,
    )

    rows = QUERIES["crossmodal_image_text_neardup"](spark, sf_dir).collect()
    n_planted = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .limit(300)
        .filter("doc_id % 10 = 0")
        .count()
    )
    full = [r for r in rows if r.id_b - r.id_a == 1_000_000]
    img_only = [r for r in rows if r.id_b - r.id_a == 2_000_000]
    txt_only = [r for r in rows if r.id_b - r.id_a == 3_000_000]
    other = [
        r for r in rows
        if r.id_b - r.id_a not in (1_000_000, 2_000_000, 3_000_000)
    ]
    assert len(full) == n_planted and n_planted > 0
    assert not img_only and not txt_only and not other
    assert all(r.img_hamming <= 6 and r.txt_hamming <= 14 for r in full)


def test_audio_fingerprint_invariances():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    prng = np.random.default_rng(11)
    t = np.arange(4096) / 8000.0
    s = sum(
        prng.uniform(0.2, 1.0)
        * np.sin(2 * np.pi * prng.uniform(100, 3500) * t + prng.uniform(0, 6.28))
        for _ in range(8)
    )
    s = s / np.max(np.abs(s)) * 0.8
    pcm = np.round(s * 32767).astype(np.int16)
    h = M.audio_fingerprint64(pcm)
    # amplitude invariance (signs of energy differences)
    assert ham(h, M.audio_fingerprint64((pcm * 0.25).astype(np.int16))) == 0
    # PCM16 WAV round-trip: exact
    assert ham(
        h,
        M.audio_fingerprint64(M.decode_wav(M.encode_wav(pcm, 8000))["samples"]),
    ) == 0
    # lossy G.711 mu-law round-trip (real compressor + spec decoder): close
    codes = M.linear_to_mulaw(pcm)
    back = M.decode_wav(M.encode_wav_mulaw(codes, 8000))["samples"]
    assert ham(h, M.audio_fingerprint64(back)) <= 8
    # unrelated mixture: far
    prng2 = np.random.default_rng(99)
    s2 = sum(
        prng2.uniform(0.2, 1.0)
        * np.sin(2 * np.pi * prng2.uniform(100, 3500) * t + prng2.uniform(0, 6.28))
        for _ in range(8)
    )
    pcm2 = np.round(s2 / np.max(np.abs(s2)) * 26000).astype(np.int16)
    assert ham(h, M.audio_fingerprint64(pcm2)) > 8


def test_linear_to_mulaw_round_trip():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    x = (np.sin(np.linspace(0, 60, 4000)) * 25000).astype("int16")
    back = M.decode_wav(M.encode_wav_mulaw(M.linear_to_mulaw(x), 8000))["samples"]
    rel = np.abs(back.astype(float) - x) / (np.abs(x) + 100.0)
    assert rel.max() < 0.05  # within mu-law quantization error


def test_audio_neardup_workload_recall(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    rows = QUERIES["multimodal_audio_neardup"](spark, sf_dir).collect()
    planted = [r for r in rows if r.id_b == r.id_a + 1_000_000]
    extras = [r for r in rows if r.id_b != r.id_a + 1_000_000]
    assert len(planted) == 40
    # LSH-family honesty: a rare genuine <=8-bit collision between
    # unrelated mixtures is allowed, but must stay rare.
    assert len(extras) <= 2


def test_video_frame_phash_survives_mjpeg():
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal as M,
    )

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (24, 32, 3)).astype("uint8") for _ in range(4)]
    d = M.demux_avi(M.encode_avi(frames), with_pixels=True)
    assert all(
        np.array_equal(f["pixels"], g) for f, g in zip(d["frames"], frames)
    )
    dm = M.demux_avi(M.encode_avi_mjpeg(frames), with_pixels=True)
    for f, g in zip(dm["frames"], frames):
        drift = bin(
            (M.phash64(f["pixels"]) ^ M.phash64(g)) & ((1 << 64) - 1)
        ).count("1")
        assert drift <= 6  # lossy MJPEG must not move the perceptual hash far


def test_video_neardup_workload_recall(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    rows = QUERIES["multimodal_video_neardup"](spark, sf_dir).collect()
    planted = [r for r in rows if r.video_b == r.video_a + 1_000_000]
    extras = [r for r in rows if r.video_b != r.video_a + 1_000_000]
    assert len(planted) == 15  # every 10th of 150 docs gets an MJPEG twin
    assert len(extras) == 0
    assert all(r.n_matched_frames >= 4 for r in planted)


# --- packing with document splits (round-7) ---------------------------------


def test_pack_with_splits_covers_every_token(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        pack_with_splits,
    )

    rows = [
        (1, "s", 100),
        (2, "s", 300),   # crosses boundaries at ctx=128
        (3, "s", 0),     # zero-token doc: no spans
        (4, "s", 128),
        (5, "t", 5),
    ]
    df = spark.createDataFrame(rows, "doc LONG, shard STRING, n LONG")
    spans = pack_with_splits(df, "doc", "n", "shard", 128).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc, []).append(r)
    assert 3 not in by_doc
    for doc, n in [(1, 100), (2, 300), (4, 128), (5, 5)]:
        ss = sorted(by_doc[doc], key=lambda r: r.seq_id)
        assert sum(r.n_span_tokens for r in ss) == n  # no token dropped
        # spans are contiguous within the doc
        pos = 0
        for r in ss:
            assert r.tok_start == pos
            pos += r.n_span_tokens
    # doc2 starts at cum=100 → spans seqs 0..3 at ctx 128: 28+128+128+16
    assert [r.n_span_tokens for r in sorted(by_doc[2], key=lambda r: r.seq_id)] == [
        28,
        128,
        128,
        16,
    ]
    # shards pack independently: doc5 (shard t) starts at seq 0
    assert by_doc[5][0].seq_id == 0 and by_doc[5][0].n_span_tokens == 5
    # every sequence's spans sum to exactly ctx_len except each shard's last
    per_seq = {}
    for r in spans:
        if r.shard == "s":
            per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_span_tokens
    last = max(per_seq)
    assert all(v == 128 for k, v in per_seq.items() if k != last)


def test_bloom_union_merges_key_sets(spark):
    a_keys = spark.createDataFrame([(f"a{i}",) for i in range(200)], ["k"])
    b_keys = spark.createDataFrame([(f"b{i}",) for i in range(200)], ["k"])
    ba = membership.bloom_build(a_keys, "k", m_bits=1 << 12, k=3)
    bb = membership.bloom_build(b_keys, "k", m_bits=1 << 12, k=3)
    u = ba.union(bb)
    assert u.n_set_bits >= max(ba.n_set_bits, bb.n_set_bits)
    both = a_keys.unionByName(b_keys)
    misses = (
        both.select(membership.bloom_contains(F.col("k"), u).alias("hit"))
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0
    with pytest.raises(ValueError, match="identical"):
        ba.union(membership.bloom_build(a_keys, "k", m_bits=1 << 10, k=3))


def test_nb_classifier_scores_inside_structured_stream(spark, tmp_path):
    """The hashed-NB scorer is stateless column algebra, so it must work
    unchanged as a streaming filter — the shape a live quality gate uses."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text as text_ops,
    )

    pos_doc, neg_doc = ["apple", "banana"], ["xray", "zulu"]
    train = spark.createDataFrame(
        [(i, pos_doc, True) for i in range(10)]
        + [(i + 50, neg_doc, False) for i in range(10)],
        "id LONG, toks ARRAY<STRING>, lbl BOOLEAN",
    )
    w = text_ops.nb_train_token_logodds(train, "toks", "lbl", n_buckets=64)

    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "apple banana apple"), (2, "xray zulu"), (3, "banana apple")],
        ["id", "text"],
    ).write.parquet(src)
    stream = spark.readStream.schema("id LONG, text STRING").parquet(src)
    scored = stream.select(
        "id", text_ops.nb_score_tokens(F.split("text", " "), w).alias("s")
    ).filter(F.col("s") > 0)
    q = (
        scored.writeStream.format("memory")
        .queryName("nb_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r.id for r in spark.sql("SELECT * FROM nb_stream_out").collect())
    assert ids == [1, 3]
