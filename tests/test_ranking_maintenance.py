"""Unit pins for operators/ranking.py, sessions.py, maintenance.py —
hand-computable fixtures, formula cross-checks against pure-Python math."""

from __future__ import annotations

import glob
import math
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row, functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    maintenance,
    ranking,
    sessions,
)

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple"),
    (3, ""),  # empty: contributes to N, produces no terms
]


def test_tfidf_matches_formula(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["id"], r["term"]): r["tfidf"]
        for r in ranking.tfidf(docs, "doc_id", "text").collect()
    }
    # N=4; df: apple 2, banana 2, cherry 1
    assert got[(0, "apple")] == pytest.approx(2 * math.log(5.0 / 3.0))
    assert got[(1, "cherry")] == pytest.approx(math.log(5.0 / 2.0))
    assert (3, "") not in got and len(got) == 5


def test_bm25_matches_formula(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["id"]: r["score"]
        for r in ranking.bm25(docs, "doc_id", "text", ["apple", "cherry"]).collect()
    }
    n, avgdl, k1, b = 4, (3 + 2 + 1 + 0) / 4.0, 1.2, 0.75

    def w(c, df_t, dl):
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        return idf * c * (k1 + 1.0) / (c + k1 * (1 - b + b * dl / avgdl))

    assert got[0] == pytest.approx(w(2, 2, 3))  # apple only
    assert got[1] == pytest.approx(w(1, 1, 2))  # cherry only
    assert got[2] == pytest.approx(w(1, 2, 1))
    assert 3 not in got  # all-miss docs absent (score would be 0)


def test_sessionize_gap_boundary(spark):
    rows = [(1, i, t) for i, t in enumerate([0, 10, 2000, 2010, 6000])]
    rows += [(2, 90, 0), (2, 91, 1800)]  # gap == 1800s: NOT a break (strict >)
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "secs"]).select(
        "user_id", "event_id", F.timestamp_seconds("secs").alias("ts")
    )
    out = sessions.sessionize(ev, "user_id", "ts", 1800, ["event_id"])
    got = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in out.collect()
    }
    assert [got[(1, i)] for i in range(5)] == [1, 1, 2, 2, 3]
    assert got[(2, 90)] == got[(2, 91)] == 1


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 6)], ["k", "v"]
    )
    source = spark.createDataFrame(
        [
            Row(k=2, v="v2-new", _deleted=False),
            Row(k=10, v="v10", _deleted=False),
            Row(k=4, v=None, _deleted=True),
        ]
    )
    out = maintenance.merge_upsert(target, source, ["k"], "_deleted")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "v1", 2: "v2-new", 3: "v3", 5: "v5", 10: "v10"}
    assert "_deleted" not in out.columns


def test_merge_upsert_without_delete_col(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    got = {
        r["k"]: r["v"]
        for r in maintenance.merge_upsert(target, source, ["k"]).collect()
    }
    assert got == {1: "a", 2: "B", 3: "C"}


def test_zorder_key_morton_interleave(spark):
    # bits=2, both cols spanning 0..3 → scaled == raw; MSB-first interleave
    # in declared column order: key bits are a1 b1 a0 b0.
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], ["a", "b"]
    )
    got = {
        (r["a"], r["b"]): r["_zkey"]
        for r in maintenance.zorder_key(df, ["a", "b"], bits=2).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b1010
    assert got[(1, 1)] == 0b0011
    assert got[(2, 3)] == 0b1101
    assert got[(3, 3)] == 0b1111
    # locality: key range of the low quadrant is disjoint from the high one
    assert max(got[(a, b)] for a in (0, 1) for b in (0, 1)) < min(
        got[(a, b)] for a in (2, 3) for b in (2, 3)
    )


def test_zorder_key_guards(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        maintenance.zorder_key(df, [])
    with pytest.raises(ValueError):
        maintenance.zorder_key(df, ["a", "b"], bits=32)


def test_compact_clusters_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    out = str(tmp_path / "opt")
    # 8 fragments, each containing the FULL value range (worst layout:
    # every file overlaps every filter).
    df = spark.range(8_000).select(
        (F.col("id") % 1000).alias("x"), F.col("id").alias("payload")
    )
    df.repartition(8).write.parquet(src)
    bytes_in = sum(
        os.stat(f).st_size for f in glob.glob(src + "/*.parquet")
    )
    stats = maintenance.compact(
        spark, src, out, zorder_cols=["x"], target_file_bytes=bytes_in // 2 + 1
    )
    assert stats["files_in"] == 8 and stats["files_out"] == 2
    back = spark.read.parquet(out)
    assert back.count() == 8_000
    assert back.columns == ["x", "payload"]  # _zkey dropped
    # clustering: each output file's x-span must be far narrower than the
    # global span (range-partitioned on the z-key of a single column = a
    # range partition on x itself).
    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append(max(maxs) - min(mins))
    assert len(spans) == 2
    assert all(s <= 600 for s in spans), spans


# --- plan hygiene (scale posture) ------------------------------------------


def test_bm25_workload_two_scans_and_broadcasts(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans import (
        inspect,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    df = QUERIES["bm25_top10"](spark, sf_dir)
    txt = inspect.plan_text(df)
    # materialized tf: the corpus is scanned for tf and for avgdl stats,
    # never a third time for dfreq.
    assert txt.count("Scan parquet") <= 2, txt
    assert inspect.has_broadcast_join(df)


def test_sessionize_workload_single_data_shuffle(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans import (
        inspect,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    df = QUERIES["events_sessionize"](spark, sf_dir)
    # one hash exchange partitions by user; both window passes and both
    # aggregations reuse it (the final orderBy adds a range exchange).
    assert inspect.shuffle_count(df) <= 2, inspect.plan_text(df, "simple")


def test_merge_workload_broadcast_anti_join(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans import (
        inspect,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
    )

    df = QUERIES["merge_upsert_orders"](spark, sf_dir)
    # the static estimate keeps a sort-merge anti-join; AQE's runtime stats
    # see the small changeset and demote it to a broadcast — assert on the
    # FINAL adaptive plan, post-execution.
    df.collect()
    txt = inspect.plan_text(df, "simple")
    assert "isFinalPlan=true" in txt, txt
    assert any(
        "BroadcastHashJoin" in ln and "LeftAnti" in ln for ln in txt.splitlines()
    ), txt


def test_pack_sequences_boundaries(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        # shard A: 300 + 300 tokens → doc 1 starts at 0 (seq 0), doc 2 at
        # 300 (seq 0), doc 3 at 600 (seq 1); doc 4 (oversized, 1300) starts
        # at 900 (seq 1) and SPANS seq 2-4 but is assigned to 1.
        ("a", 1, 300),
        ("a", 2, 300),
        ("a", 3, 300),
        ("a", 4, 1300),
        ("a", 5, 10),  # starts at 2200 → seq 4
        # shard B packs independently from 0.
        ("b", 1, 512),
        ("b", 2, 1),  # starts exactly at 512 → seq 1
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
    got = {
        (r["source"], r["doc_id"]): r["seq_id"]
        for r in pack_sequences(df, "doc_id", "n_tok", "source", 512).collect()
    }
    assert got == {
        ("a", 1): 0,
        ("a", 2): 0,
        ("a", 3): 1,
        ("a", 4): 1,
        ("a", 5): 4,
        ("b", 1): 0,
        ("b", 2): 1,
    }


def test_pack_sequences_rejects_bad_ctx(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame([("a", 1, 1)], ["source", "doc_id", "n_tok"])
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tok", "source", 0)


def test_token_budget_filter_prefix_semantics(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        token_budget_filter,
    )

    rows = [
        # shard a, longest-first order: d3(500) d1(400) d2(300) d4(100)
        # starts: 0, 500, 900, 1200 → budget 1000 keeps d3, d1, d2 (starts
        # 0/500/900 < 1000; d2 overruns to 1200 — allowed), drops d4.
        ("a", 1, 400),
        ("a", 2, 300),
        ("a", 3, 500),
        ("a", 4, 100),
        # shard b: single doc bigger than the budget still kept (start 0).
        ("b", 9, 5000),
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
    kept = token_budget_filter(
        df, "n_tok", "source", 1000,
        order_cols=[F.col("n_tok").desc(), F.col("doc_id")],
    )
    got = sorted((r["source"], r["doc_id"]) for r in kept.collect())
    assert got == [("a", 1), ("a", 2), ("a", 3), ("b", 9)]
    assert kept.columns == ["source", "doc_id", "n_tok"]  # _start dropped

    with pytest.raises(ValueError):
        token_budget_filter(df, "n_tok", "source", 0)


def test_pack_sequences_exact_beyond_float53(spark):
    # seq_id must be exact integer arithmetic: with a cumulative token count
    # of 2^53 + 1, float64 division would round the start down to 2^53 and
    # mis-assign the document. ctx_len=1 makes seq_id == start directly.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
        pack_sequences,
    )

    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [("a", 1, big), ("a", 2, 5)], ["source", "doc_id", "n_tok"]
    )
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "doc_id", "n_tok", "source", 1).collect()
    }
    assert got == {1: 0, 2: big}


def test_bm25_hostile_terms(spark):
    # A query term literally named "id" must not collide with the group key,
    # and a term containing a backtick must not break column quoting — the
    # pivot uses synthetic per-term indices, never the raw term string.
    docs = spark.createDataFrame(
        [(0, "id apple id"), (1, "apple"), (2, "nothing here")],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: r["score"]
        for r in ranking.bm25(docs, "doc_id", "text", ["id", "apple"]).collect()
    }
    assert set(got) == {0, 1}
    assert got[0] > got[1] > 0  # doc 0 matches both terms

    # backtick term: tokenizer strips it from docs so it matches nothing,
    # but the plan must still build and run
    assert ranking.bm25(docs, "doc_id", "text", ["a`b", "apple"]).count() == 2

    with pytest.raises(ValueError):
        ranking.bm25(docs, "doc_id", "text", ["apple", "apple"])
