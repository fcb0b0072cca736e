"""Skew-salting operators (results must equal unsalted plans) and the
custom stateful streaming operator (must converge to the batch aggregate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
    read_events_stream,
    run_to_memory,
    stateful_user_totals,
)


def _skewed_df(spark):
    # 90% of rows share one hot key — the histogram AQE's skew-agg can't fix
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold-"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            [("count", "*", "n"), ("sum", "v", "s"), ("min", "v", "mn"), ("max", "v", "mx")],
            salt_n=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = _skewed_df(spark).withColumnRenamed("v", "lv")
    right = spark.createDataFrame(
        [("HOT", 1.5), ("cold-1", 2.0), ("cold-7", 3.0)], ["k", "weight"]
    )
    plain = left.join(right, "k").agg(F.round(F.sum(F.col("lv") * F.col("weight")), 4)).first()[0]
    salted = (
        salted_join(left, right, "k", salt_n=4)
        .agg(F.round(F.sum(F.col("lv") * F.col("weight")), 4))
        .first()[0]
    )
    assert plain == salted
    # row counts preserved too (no dup/loss from the replication)
    assert left.join(right, "k").count() == salted_join(left, right, "k", salt_n=4).count()


def test_salted_join_splits_hot_key_across_partitions(spark):
    # Round-8: the salt must ACTUALLY spread the hot key — the join's
    # shuffle partitions on (key, salt), and the hot key's rows land on
    # several distinct salts, so no single reducer sees the whole key.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.inspect import (
        plan_text,
    )

    left = _skewed_df(spark).withColumnRenamed("v", "lv")
    right = spark.createDataFrame([("HOT", 1.5)], ["k", "weight"])
    joined = salted_join(left, right, "k", salt_n=8)
    txt = plan_text(joined)
    assert "__salt" in txt, "salt column missing from the physical plan"
    # Replay the left-side salting (same seed) and count distinct salts
    # the hot key actually takes: must use most of the 8 buckets.
    salts = (
        left.withColumn(
            "__salt", F.floor(F.rand(seed=42) * 8).cast("int")
        )
        .filter(F.col("k") == "HOT")
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts >= 6, f"hot key only spread over {salts}/8 salt buckets"


def test_skew_salted_join_workload_matches_unsalted(spark, sf_dir):
    # The driver-row workload (round-8): salted result ≡ plain join.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        QUERIES,
        load,
    )

    got = {
        r.s_nationkey: (r.n, r.revenue)
        for r in QUERIES["skew_salted_join"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("sk"),
        "l_extendedprice",
        "l_discount",
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_nationkey"
    )
    want = {
        r.s_nationkey: (r.n, r.revenue)
        for r in li.join(sup, "sk")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_stateful_user_totals_converges_to_batch(spark, sf_dir):
    stream_out = run_to_memory(
        stateful_user_totals(read_events_stream(spark, sf_dir)), mode="update"
    )
    # update-mode memory sink may hold one row per user per batch: take the
    # last (= cumulative) row per user
    final = (
        stream_out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("t"))
        .collect()
    )
    got = {r.user_id: (r.n, round(r.t, 4)) for r in final}

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    want = {r.user_id: (r.n, round(r.t, 4)) for r in batch}
    assert got == want


def test_stream_hll_registers_converge_to_batch_and_stay_bounded(spark, sf_dir):
    # The streaming sketch's contract: (1) the state is bounded at m rows
    # per window regardless of cardinality; (2) running the stream to
    # completion yields EXACTLY the batch register table over the same
    # rows (MAX-folding across micro-batches is the HLL merge, so the
    # result is path-independent).
    from pyspark.sql import functions as F

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        sketch as sk,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        tumbling_hll_registers,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    events = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        tumbling_hll_registers(events, "user_id", "1 hour", p=7),
        mode="complete",
    )
    per_window = got.groupBy("ws").count().agg(F.max("count")).collect()[0][0]
    assert per_window <= 128  # m = 2^7, by construction

    batch = load(spark, sf_dir, "events").select(
        F.window("ts", "1 hour")["start"].alias("ws"), "user_id"
    )
    want = sk.hll_registers(
        batch, F.col("user_id").cast("string"), p=7, group_cols=["ws"]
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_cms_converges_and_never_undercounts(spark, sf_dir):
    # Streaming CMS contract: (1) state bounded at depth*width per
    # window; (2) the bounded stream's grid equals the batch grid
    # (COUNT's fold is the CMS addition-merge); (3) point estimates from
    # the streamed grid never undercount the true per-window frequency.
    from pyspark.sql import functions as F

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        sketch as sk,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        tumbling_cms,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
        load,
    )

    events = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        tumbling_cms(events, "user_id", "1 hour", 128, 2), mode="complete"
    )
    per_window = got.groupBy("ws").count().agg(F.max("count")).collect()[0][0]
    assert per_window <= 2 * 128

    ev = load(spark, sf_dir, "events").select(
        F.window("ts", "1 hour")["start"].alias("ws"),
        F.col("user_id").cast("string").alias("k"),
    )
    # batch grid over the same rows, per window — must match exactly
    batch = (
        ev.select(
            "ws",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).cast("int").alias("i"),
                        sk._cms_bucket(F.col("k"), i, 128).cast("int").alias("bucket"),
                    )
                    for i in range(2)
                ])
            ).alias("p"),
        )
        .select("ws", "p.i", "p.bucket")
        .groupBy("ws", "i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0

    # never-undercount: probe one window's grid with that window's truth
    ws0 = got.agg(F.min("ws")).collect()[0][0]
    grid0 = got.filter(F.col("ws") == ws0).select("i", "bucket", "cnt")
    truth0 = (
        ev.filter(F.col("ws") == ws0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    probed = sk.cms_point_estimates(grid0, truth0, "k", 128, 2)
    assert probed.filter(F.col("cms_est") < F.col("true_cnt")).count() == 0


def test_temporal_enrich_cross_batch_late_reference(spark, tmp_path):
    """Round-10: the buffered temporal enrichment (buffer_seconds) holds a
    watermark-bounded reference buffer per key, so a reference arriving in
    a LATER micro-batch with an EARLIER timestamp still enriches events
    behind it — and an event never joins a reference from its future.
    Two parquet files + maxFilesPerTrigger=1 force two micro-batches."""
    import time
    from datetime import datetime, timezone

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        temporal_enrich_latest,
    )

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc)

    cols = ["user_id", "event_id", "event_type", "ts", "value"]
    # batch 1: ref r101@t=100, event e201@t=110 (joins r101)
    b1 = [(1, 101, "click", ts(100), 1.0), (1, 201, "purchase", ts(110), 9.0)]
    # batch 2: LATE ref r102@t=50; event e202@t=70 (must join r102, and
    # must NOT join the future r101@100); event e203@t=120 (joins r101 —
    # the buffer retained it past the late insert)
    b2 = [
        (1, 102, "click", ts(50), 2.0),
        (1, 202, "purchase", ts(70), 9.0),
        (1, 203, "purchase", ts(120), 9.0),
    ]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, cols).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    spark.createDataFrame(b2, cols).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )

    def run(buffer_seconds):
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, event_type string, "
                "ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(str(src))
        )
        out = temporal_enrich_latest(
            stream, "click", "purchase", buffer_seconds=buffer_seconds
        )
        name = f"te_{'buf' if buffer_seconds else 'plain'}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                out.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return {
            r.evt_id: (r.ref_id, r.ref_value)
            for r in spark.table(name).collect()
        }

    buffered = run(3600.0)
    assert buffered[201] == (101, 1.0)
    assert buffered[202] == (102, 2.0), "late reference missed"
    assert buffered[203] == (101, 1.0), "buffer dropped the newest ref"

    # the single-tuple variant cannot recover the late reference, but the
    # round-10 guard keeps it from joining the FUTURE one
    plain = run(None)
    assert plain[201] == (101, 1.0)
    assert plain[202] == (None, None)
    assert plain[203] == (101, 1.0)


def test_temporal_enrich_buffer_evicts_below_horizon(spark, tmp_path):
    """The reference buffer is BOUNDED: refs older than the horizon evict
    (keeping one floor ref), so state can't grow with the stream."""
    from datetime import datetime, timezone

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        temporal_enrich_latest,
    )

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc)

    cols = ["user_id", "event_id", "event_type", "ts", "value"]
    rows = [(1, 100 + i, "click", ts(10 * i), float(i)) for i in range(20)]
    rows.append((1, 900, "purchase", ts(195), 0.0))
    src = tmp_path / "src2"
    src.mkdir()
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
        str(src / "all.parquet")
    )
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, "
            "ts timestamp, value double"
        )
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(str(src))
    )
    out = temporal_enrich_latest(
        stream, "click", "purchase", buffer_seconds=30.0
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("te_evict")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {r.evt_id: r.ref_id for r in spark.table("te_evict").collect()}
    # purchase@195 joins click@190 (event_id 119) — correctness unaffected
    # by eviction of the old refs
    assert got[900] == 119


def test_stream_append_exactly_once_replay_and_crash(spark, tmp_path, sf_dir):
    """Round-11/12: the exactly-once append sink must (a) land every
    event exactly once across a normal run, (b) skip a re-delivered
    COMMITTED epoch of the SAME producer (same app_id re-sees the same
    file as epoch 0, which is in the ledger — a no-op), (b2) NOT drop a
    NEW producer's epoch 0 (the r12 advice fix: the ledger keys on
    (app_id, epoch), so a fresh checkpoint-less query with its own
    app_id appends instead of being silently discarded), and (c) recover
    a crash mid-move (partial epoch files on disk, no ledger entry) to
    exactly the batch's rows — never a mix of attempts, never a
    duplicate."""
    import hashlib
    import os

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
        Engine,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        stream_append_exactly_once,
    )

    def events(n=None):
        s = read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "value"
        )
        return s

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_raw = raw.count()

    # (a) normal run: every event lands exactly once
    e = Engine(spark, str(tmp_path / "x1"))
    e.create_table(
        "ev_sink",
        [("event_id", "BIGINT"), ("user_id", "BIGINT"), ("value", "DOUBLE")],
    )
    q = stream_append_exactly_once(e, "ev_sink", events(), app_id="prod-a")
    q.processAllAvailable()
    q.stop()
    assert e.table("ev_sink").count() == n_raw
    assert e.table("ev_sink").select("event_id").distinct().count() == n_raw

    # (b) re-delivery of a committed epoch by the SAME producer: a second
    # query with the same app_id re-sees the same file as epoch 0, which
    # IS in its ledger entry — the table must not change
    q2 = stream_append_exactly_once(e, "ev_sink", events(), app_id="prod-a")
    q2.processAllAvailable()
    q2.stop()
    assert e.table("ev_sink").count() == n_raw

    # (b2) a NEW producer (default app_id = fresh) carrying its own epoch
    # 0 must land — an epoch-only ledger would silently drop it
    qb = stream_append_exactly_once(e, "ev_sink", events())
    qb.processAllAvailable()
    qb.stop()
    assert e.table("ev_sink").count() == 2 * n_raw

    # (c) crash mid-move: a partial epoch-0 file sits in the table dir
    # with NO ledger entry; the sink's replay must remove it before
    # moving its complete set (exact rows, partial gone)
    e2 = Engine(spark, str(tmp_path / "x2"))
    e2.create_table(
        "ev_sink",
        [("event_id", "BIGINT"), ("user_id", "BIGINT"), ("value", "DOUBLE")],
    )
    app8 = hashlib.md5(b"prod-c").hexdigest()[:8]
    partial = os.path.join(
        e2.store.table_path("ev_sink"), f"epoch-{app8}-0-part-99999.parquet"
    )
    e.table("ev_sink").limit(7).write.mode("overwrite").parquet(
        str(tmp_path / "junk")
    )
    src = next(
        f for f in os.listdir(str(tmp_path / "junk")) if f.endswith(".parquet")
    )
    os.rename(os.path.join(str(tmp_path / "junk"), src), partial)
    q3 = stream_append_exactly_once(e2, "ev_sink", events(), app_id="prod-c")
    q3.processAllAvailable()
    q3.stop()
    assert e2.table("ev_sink").count() == n_raw
    assert not os.path.exists(partial)


def test_stream_append_exactly_once_legacy_ledger(spark, tmp_path, sf_dir):
    """Round-12: a pre-r12 ledger (a bare JSON list of epoch ids) must
    not crash the upgraded sink — it reads as an anonymous producer's
    history, so a NEW producer's epoch 0 still lands."""
    import json
    import os

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
        Engine,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        stream_append_exactly_once,
    )

    e = Engine(spark, str(tmp_path / "leg"))
    e.create_table(
        "ev_sink",
        [("event_id", "BIGINT"), ("user_id", "BIGINT"), ("value", "DOUBLE")],
    )
    ldir = os.path.join(e.store.root, ".stream_commits")
    os.makedirs(ldir, exist_ok=True)
    with open(os.path.join(ldir, "ev_sink.json"), "w") as f:
        json.dump([0, 1], f)  # pre-r12 format: epoch ids only
    src = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    q = stream_append_exactly_once(e, "ev_sink", src, app_id="fresh")
    q.processAllAvailable()
    q.stop()
    n_raw = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert e.table("ev_sink").count() == n_raw
    with open(os.path.join(ldir, "ev_sink.json")) as f:
        data = json.load(f)
    assert data[""] == [0, 1] and data["fresh"] == [0]


def test_stream_append_exactly_once_partitioned(spark, tmp_path, sf_dir):
    """Round-12 (verdict #5): the exactly-once sink over a HIVE-
    PARTITIONED table — the primary 100-TB ingest shape. Epoch files
    land inside their ``col=value/`` directories (none at the table
    root), per-partition counts are exact, a same-producer re-delivery
    is skipped, and a crash mid-move with a partial epoch file INSIDE a
    partition directory recovers to exactly the batch's rows."""
    import hashlib
    import os

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
        Engine,
    )
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.streaming.ops import (
        read_events_stream,
        stream_append_exactly_once,
    )

    cols = [
        ("event_id", "BIGINT"),
        ("user_id", "BIGINT"),
        ("event_type", "TEXT"),
        ("value", "DOUBLE"),
    ]

    def events():
        return read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_raw = raw.count()
    want = {
        r.event_type: r.n
        for r in raw.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }

    e = Engine(spark, str(tmp_path / "p1"))
    e.create_table("ev_part", cols, partition_by=["event_type"])
    q = stream_append_exactly_once(e, "ev_part", events(), app_id="pp")
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_type: r.n
        for r in e.table("ev_part")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    tdir = e.store.table_path("ev_part")
    assert not [f for f in os.listdir(tdir) if f.endswith(".parquet")]
    assert any(d.startswith("event_type=") for d in os.listdir(tdir))

    # same-producer re-delivery: skipped
    q2 = stream_append_exactly_once(e, "ev_part", events(), app_id="pp")
    q2.processAllAvailable()
    q2.stop()
    assert e.table("ev_part").count() == n_raw

    # crash mid-move: a partial epoch file inside a partition dir, no
    # ledger entry — replay must remove it anywhere in the tree
    e2 = Engine(spark, str(tmp_path / "p2"))
    e2.create_table("ev_part", cols, partition_by=["event_type"])
    app8 = hashlib.md5(b"pq").hexdigest()[:8]
    pdir = os.path.join(e2.store.table_path("ev_part"), "event_type=click")
    os.makedirs(pdir, exist_ok=True)
    partial = os.path.join(pdir, f"epoch-{app8}-0-part-99999.parquet")
    raw.select("event_id", "user_id", "value").limit(5).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "junk2"))
    src = next(
        f
        for f in os.listdir(str(tmp_path / "junk2"))
        if f.endswith(".parquet")
    )
    os.rename(os.path.join(str(tmp_path / "junk2"), src), partial)
    q3 = stream_append_exactly_once(e2, "ev_part", events(), app_id="pq")
    q3.processAllAvailable()
    q3.stop()
    assert e2.table("ev_part").count() == n_raw
    assert not os.path.exists(partial)
