"""Streaming workload entries: bounded event streams run to completion.

Each entry drives a real Structured Streaming query (watermark + windowed /
stateful op) over the events table via a memory sink, then returns the
materialized result — so the driver's batch comparator can still check it.
Oracles mirror the *event-time semantics* in plain SQL (time_bucket for
tumbling/sliding alignment, lag-gap cumsum for sessionization), which is
exactly what the streaming engine must converge to on bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.ops import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_value_sum,
    tumbling_counts,
)
from .registry import query


@query(
    "stream_tumbling_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY ws, event_type
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(tumbling_counts(events, "1 hour"), mode="complete")


@query(
    "stream_sliding_window",
    """
    SELECT ws, count(*) AS n, round(sum(value), 2) AS total
    FROM (
      SELECT ts, value,
             time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' * k AS ws
      FROM events, UNNEST([0, 1]) AS t(k)
    )
    WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
    GROUP BY ws
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1h windows sliding every 30min: every event lands in exactly 2 windows
    # — the UNNEST([0,1]) in the oracle enumerates the same membership.
    # Compared metric is SUM (exact at 2 decimals for 2-decimal inputs);
    # AVG of small windows sits on half-cent rounding knife-edges where
    # Spark's BigDecimal HALF_UP and DuckDB's scaled rounding legitimately
    # differ — see sliding_value_avg for the avg variant (pytest-covered).
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(sliding_value_sum(events, "1 hour", "30 minutes"), mode="complete")


@query(
    "stream_session_windows",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           user_id, count(*) AS n_events, round(sum(value), 2) AS total
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark session windows are [start, last_event + gap); an event exactly
    # at the previous event's ts+gap starts a NEW session — hence `>=` in
    # the oracle's gap test.
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(session_windows(events, "5 minutes"), mode="complete")


@query(
    "stream_dedup_within_watermark",
    "SELECT count(*) AS unique_keys FROM (SELECT DISTINCT user_id, event_type FROM events)",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming dedup emits one (arbitrary) row per key, so the
    # deterministic check is the surviving key count (batch agg on top of
    # the streaming result).
    events = read_events_stream(spark, sf_dir)
    survivors = run_to_memory(
        dedup_within_watermark(events, ["user_id", "event_type"]), mode="append"
    )
    return survivors.agg(F.count(F.lit(1)).alias("unique_keys"))


@query(
    "stream_stateful_user_totals",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Custom stateful operator (applyInPandasWithState): on bounded input the
    # per-user running totals converge to the plain batch aggregate, which is
    # exactly what the oracle checks.
    from ..streaming.ops import stateful_user_totals

    events = read_events_stream(spark, sf_dir)
    out = run_to_memory(stateful_user_totals(events), mode="update")
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("total_value"), 2).alias("total_value"),
    )


@query(
    "stream_stream_join",
    """
    SELECT c.user_id, count(*) AS pairs, round(sum(p.value), 2) AS total_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '600 seconds'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-stream interval join on bounded input processed as one batch:
    # every qualifying pair is emitted, so the batch interval-join oracle is
    # exact. The streaming semantics (watermarked state eviction) are what
    # a live run exercises; correctness converges to this.
    from ..streaming.ops import stream_stream_interval_join

    events = read_events_stream(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = run_to_memory(
        stream_stream_interval_join(clicks, purchases, 600), mode="append"
    )
    return (
        joined.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.sum("purchase_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "stream_static_enrich",
    """
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS ws, n.n_name AS nation,
           count(*) AS n, round(sum(e.value), 2) AS total
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY ws, nation
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-static join: the event stream is enriched per micro-batch with
    # a broadcast customer→nation dimension (no join state, no watermark on
    # the static side), then windowed per nation. The static-static
    # customer⋈nation join resolves once at plan time.
    from ..streaming.ops import static_enrich
    from .registry import load

    events = read_events_stream(spark, sf_dir)
    dim = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey"), F.col("n_name").alias("nation"))
    )
    enriched = static_enrich(
        events, dim, events["user_id"] == dim["c_custkey"]
    )
    agg = (
        enriched.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(F.col("window.start").alias("ws"), "nation", "n", "total")
    )
    return run_to_memory(agg, mode="complete")


@query(
    "stream_bloom_drop_denied",
    """
    WITH denied AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
      WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 2) >= 'f0'
    ),
    dh AS (
      SELECT CAST(concat('0x', substr(md5(k), 1, 15)) AS BIGINT) % 4096 AS h1,
             CAST(concat('0x', substr(md5(k), 16, 15)) AS BIGINT) % 4096 AS h2
      FROM denied
    ),
    bits AS (
      SELECT DISTINCT (h1 + i * h2) % 4096 AS pos
      FROM dh, (SELECT unnest(range(3)) AS i)
    ),
    eh AS (
      SELECT event_id, ts, value,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 4096 AS h1,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 16, 15))
                  AS BIGINT) % 4096 AS h2
      FROM events
    ),
    ep AS (
      SELECT event_id, ts, value, (h1 + i * h2) % 4096 AS pos
      FROM eh, (SELECT unnest(range(3)) AS i)
    ),
    hit AS (
      SELECT event_id, min(ts) AS ts, min(value) AS value,
             bool_and(bits.pos IS NOT NULL) AS in_bloom
      FROM ep LEFT JOIN bits ON ep.pos = bits.pos
      GROUP BY event_id
    )
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           count(*) AS n, round(sum(value), 2) AS total
    FROM hit WHERE NOT in_bloom
    GROUP BY ws
    """,
)
def stream_bloom_drop_denied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion guard (round-7): drop events from a denylisted
    user set using a BLOOM FILTER broadcast into the stream — the
    don't-re-ingest / denylist pattern at 100 TB, where the membership
    probe must be a stateless scan-stage predicate (no stream-static join,
    no state store). The bloom is built ONCE batch-side over the denied
    keys; the probe is plan-literal column algebra inside the streaming
    filter, so each micro-batch pays scan cost only. The oracle replays
    the bloom bit-for-bit in SQL (identical md5 double hashing —
    including any false-positive drops) and the hourly aggregate must
    converge to the batch answer on bounded input."""
    from ..operators import membership
    from .registry import load

    static_events = load(spark, sf_dir, "events")
    denied = (
        static_events.filter(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) >= "f0"
        )
        .select(F.col("user_id").cast("string").alias("k"))
        .distinct()
    )
    bloom = membership.bloom_build(denied, "k", m_bits=4096, k=3)
    stream = read_events_stream(spark, sf_dir)
    kept = stream.filter(
        ~membership.bloom_contains(F.col("user_id").cast("string"), bloom)
    )
    agg = (
        kept.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(F.col("window.start").alias("ws"), "n", "total")
    )
    return run_to_memory(agg, mode="complete")


@query(
    "stream_hll_distinct_users",
    """
    WITH h AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events
    ),
    r AS (
      SELECT ws, h % 256 AS bucket,
             MAX(53 - CASE WHEN h // 256 = 0 THEN 0
                      ELSE length(bin(h // 256)) END) AS rho
      FROM h GROUP BY 1, 2
    ),
    z AS (
      SELECT ws, CAST(COUNT(*) AS INT) AS v_obs,
             SUM(1::BIGINT << (53 - rho)) AS zs
      FROM r GROUP BY ws
    ),
    e AS (
      SELECT ws, v_obs,
             CAST(zs + (256 - v_obs) * (1::BIGINT << 53) AS DOUBLE)
               / (1::BIGINT << 53) AS zd,
             256 - v_obs AS v_zero
      FROM z
    ),
    est AS (
      SELECT ws, v_obs, v_zero,
             0.7213/(1 + 1.079/256) * 256 * 256 / zd AS e_raw
      FROM e
    ),
    x AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_cnt
      FROM events GROUP BY 1
    )
    SELECT est.ws, v_obs,
           round(CASE WHEN e_raw <= 640.0 AND v_zero > 0
                 THEN 256.0 * ln(256.0 / v_zero) ELSE e_raw END, 2) + 0.0
             AS hll_est,
           exact_cnt
    FROM est JOIN x ON est.ws = x.ws
    """,
)
def stream_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user sketches (round 8): the HLL register table
    IS the streaming state — ``groupBy(window, bucket).max(rho)`` holds at
    most 256 rows per window regardless of user cardinality, and the MAX
    fold across micro-batches is exactly the HLL merge. An exact streaming
    COUNT(DISTINCT) would hold every key seen; this state is constant per
    window. The estimate runs batch-side over the materialized registers
    (presentation, not state); the oracle replays registers AND estimates
    bit-for-bit, with the exact per-window count alongside."""
    from ..operators import sketch as sk
    from ..streaming.ops import run_to_memory, tumbling_hll_registers
    from .registry import load

    events = read_events_stream(spark, sf_dir)
    regs = run_to_memory(
        tumbling_hll_registers(events, "user_id", "1 hour", p=8),
        mode="complete",
    )
    est = sk.hll_estimate(regs, p=8, group_cols=["ws"])
    exact = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.countDistinct("user_id").alias("exact_cnt"))
        .select(F.col("window.start").alias("ws"), "exact_cnt")
    )
    return est.join(exact, "ws")


@query(
    "stream_session_hll_users",
    """
    WITH g AS (
      SELECT event_type, ts, user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                       IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY event_type
                                          ORDER BY ts) > INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT event_type, ts, user_id,
             SUM(brk) OVER (PARTITION BY event_type ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    w AS (SELECT event_type, sid, MIN(ts) AS session_start
          FROM s GROUP BY 1, 2),
    h AS (
      SELECT event_type, sid,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM s
    ),
    r AS (
      SELECT event_type, sid, h % 128 AS bucket,
             MAX(54 - CASE WHEN h // 128 = 0 THEN 0
                      ELSE length(bin(h // 128)) END) AS rho
      FROM h GROUP BY 1, 2, 3
    ),
    z AS (
      SELECT event_type, sid, CAST(COUNT(*) AS INT) AS v_obs,
             SUM(1::BIGINT << (54 - rho)) AS zs
      FROM r GROUP BY 1, 2
    ),
    e AS (
      SELECT event_type, sid, v_obs,
             CAST(zs + (128 - v_obs) * (1::BIGINT << 54) AS DOUBLE)
               / (1::BIGINT << 54) AS zd,
             128 - v_obs AS v_zero
      FROM z
    ),
    est AS (
      SELECT event_type, sid, v_obs, v_zero,
             0.7213/(1 + 1.079/128) * 128 * 128 / zd AS e_raw
      FROM e
    ),
    x AS (SELECT event_type, sid,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_cnt
          FROM s GROUP BY 1, 2)
    SELECT w.event_type, w.session_start, est.v_obs,
           round(CASE WHEN e_raw <= 320.0 AND v_zero > 0
                 THEN 128.0 * ln(128.0 / v_zero) ELSE e_raw END, 2) + 0.0
             AS hll_est,
           x.exact_cnt
    FROM est
    JOIN x ON est.event_type = x.event_type AND est.sid = x.sid
    JOIN w ON w.event_type = est.event_type AND w.sid = est.sid
    """,
)
def stream_session_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION-window HLL (round 9): distinct users per 2-hour-
    gap activity burst, per event type, with the register VECTOR as the
    session state (m explicit MAX aggregates in one streaming
    aggregation). The deep property: the session-window MERGE (two
    bursts joined by a late-but-in-watermark event) and the HLL MERGE
    are the same fold — elementwise max of the registers — so the sketch
    stays exact under every session-merge the engine performs, where an
    exact distinct-count state would hold every key seen. (Grouping by
    bucket instead — the tumbling form's shape — would sessionize each
    bucket independently and SPLIT sessions; the oracle caught exactly
    that.) State = m small ints per active (type, session); the
    watermark closes sessions. The estimate runs batch-side over the
    unpivoted registers; the oracle replays gaps-and-islands
    sessionization, registers, AND the estimate bit-for-bit (ties in ts
    cannot flip an island: equal timestamps have gap 0), with the exact
    per-session count alongside."""
    from ..operators import sketch as sk
    from ..streaming.ops import run_to_memory, session_hll_registers
    from .registry import load

    m = 128  # p = 7
    events = read_events_stream(spark, sf_dir)
    wide = run_to_memory(
        session_hll_registers(
            events, "event_type", "user_id", "2 hours", p=7
        ),
        mode="complete",
    )
    stack = ", ".join(f"'{i}', r{i}" for i in range(m))
    regs = wide.selectExpr(
        "event_type",
        "session_start",
        f"stack({m}, {stack}) AS (bucket, rho)",
    ).filter(F.col("rho").isNotNull())
    est = sk.hll_estimate(
        regs, p=7, group_cols=["event_type", "session_start"]
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "2 hours"), "event_type")
        .agg(F.countDistinct("user_id").alias("exact_cnt"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "event_type",
            "exact_cnt",
        )
    )
    return est.join(exact, ["event_type", "session_start"]).select(
        "event_type", "session_start", "v_obs", "hll_est", "exact_cnt"
    )


@query(
    "stream_cms_user_traffic",
    """
    WITH g AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, r.i,
             CAST('0x' || substr(md5('cms' || CAST(r.i AS VARCHAR) || '|'
                                  || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 256 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN range(3) r(i)
      GROUP BY 1, 2, 3
    )
    SELECT ws, CAST(i AS INT) AS i, CAST(bucket AS INT) AS bucket, cnt
    FROM g
    """,
)
def stream_cms_user_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-window traffic sketch (round 8): the Count-Min grid
    IS the streaming state — ``groupBy(window, i, bucket).count`` holds
    ≤ depth·width = 768 counter rows per window regardless of user
    cardinality, and COUNT's micro-batch fold is exactly the CMS merge
    (addition), so the never-undercount guarantee survives streaming.
    The oracle replays every occupied grid cell bit-for-bit (salted md5
    positions and counts); heavy-hitter point queries run batch-side
    against this grid via cms_point_estimates (pinned in pytest)."""
    from ..streaming.ops import run_to_memory, tumbling_cms

    events = read_events_stream(spark, sf_dir)
    return run_to_memory(
        tumbling_cms(events, "user_id", "1 hour", 256, 3), mode="complete"
    )


@query(
    "stream_hist_quantiles",
    """
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS ws,
             LEAST(GREATEST(CAST(floor((CAST(value AS DOUBLE) - 0.0)
                                        / 2.0) AS INT), 0), 499) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    c AS (
      SELECT ws, bin, cnt,
             SUM(cnt) OVER (PARTITION BY ws ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM b
    ),
    n AS (SELECT ws, SUM(cnt) AS n FROM b GROUP BY 1),
    qv AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q),
    sel AS (
      SELECT n.ws, qv.q, n.n, MIN(c.bin) AS bin
      FROM qv CROSS JOIN n JOIN c
        ON c.ws = n.ws AND c.cum >= CAST(ceil(qv.q * n.n) AS BIGINT)
      GROUP BY 1, 2, 3
    ),
    e AS (
      SELECT s.ws, s.q, s.n, s.bin, c.cnt, c.cum
      FROM sel s JOIN c ON c.ws = s.ws AND c.bin = s.bin
    )
    SELECT e.ws, e.q,
           round(0.0 + 2.0 * (e.bin +
                 CAST(CAST(ceil(e.q * e.n) AS BIGINT) - (e.cum - e.cnt)
                      AS DOUBLE)
                 / CAST(e.cnt AS DOUBLE)), 2) + 0.0 AS est_q
    FROM e
    """,
)
def stream_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming histogram quantiles (round 9): p50/p95 of event value
    per DAY with the equi-width BINS as the streaming state (≤ 500
    counter rows per window; COUNT's micro-batch fold IS the histogram
    merge — the same state-is-the-sketch property as the streaming
    HLL/CMS forms, and the replayable alternative to a streaming
    t-digest). The quantile interpolation runs batch-side over the
    materialized bins; the oracle replays bin assignment, cumulative
    ranks, and interpolation bit-for-bit."""
    from ..operators import sketch as sk
    from ..streaming.ops import run_to_memory, tumbling_histogram

    events = read_events_stream(spark, sf_dir)
    bins = run_to_memory(
        tumbling_histogram(
            events, "value", 0.0, 1000.0, 500, width="1 day"
        ),
        mode="complete",
    )
    # hist_quantiles self-joins its input (cumulative ranks vs totals);
    # a memory-sink VIEW trips Spark's self-join ambiguity resolution
    # where a file scan doesn't — checkpoint the (≤ n_bins×windows rows)
    # frame to give the two join sides independent lineage.
    bins = bins.localCheckpoint(eager=True)
    return sk.hist_quantiles(
        bins, [0.5, 0.95], 0.0, 1000.0, 500, group_cols=["ws"]
    )


@query(
    "stream_temporal_enrich_buffered",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS evt_id, p.user_id,
           c.event_id AS ref_id, c.value AS ref_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def stream_temporal_enrich_buffered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-10: the BUFFERED temporal enrichment — per-key state is a
    watermark-bounded reference buffer (all clicks within the horizon of
    the key's max event time + one floor click), so a late-arriving
    reference enriches a later batch's events (multi-batch disorder tests
    in test_skew_and_stateful.py). On bounded single-batch input the
    buffered and single-tuple variants both converge exactly to the batch
    backward as-of join — the same DuckDB NATIVE ASOF oracle — so a green
    row here pins that the buffer/eviction machinery changes nothing when
    nothing is late."""
    from ..streaming.ops import run_to_memory, temporal_enrich_latest

    events = read_events_stream(spark, sf_dir)
    return run_to_memory(
        temporal_enrich_latest(
            events, "click", "purchase", buffer_seconds=86400.0
        ),
        mode="append",
    )


@query(
    "stream_temporal_enrich",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS evt_id, p.user_id,
           c.event_id AS ref_id, c.value AS ref_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def stream_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming temporal (as-of) enrichment (round 9): every purchase
    carries the user's LATEST click at-or-before it, held as ONE
    GroupState tuple per user — the as-of join no built-in streaming
    operator expresses (interval joins need a bounded interval; as-of
    wants the most recent, however old). On bounded input this converges
    exactly to the batch backward as-of join, which the oracle replays
    with DuckDB's NATIVE ASOF JOIN — an independent implementation.
    ref_value is an exact carried input double (unrounded-safe)."""
    from ..streaming.ops import run_to_memory, temporal_enrich_latest

    events = read_events_stream(spark, sf_dir)
    return run_to_memory(
        temporal_enrich_latest(events, "click", "purchase"), mode="append"
    )


@query(
    "stream_append_exactly_once",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
           round(SUM(value), 2) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_append_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion end-to-end (round-11): stream the
    events file through the idempotent epoch-ledger append sink into an
    engine table — TWICE (the second checkpoint-less query re-delivers
    the same data as a committed epoch, which the ledger must skip) —
    then aggregate the TABLE. The oracle is the same aggregate over the
    raw events: any duplicated epoch, lost batch, or partial-epoch leak
    flips n/n_ids/total. n_ids == n additionally pins row-level
    uniqueness inside the hash check."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .. import Engine
    from ..streaming.ops import stream_append_exactly_once as sink

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"sparkdb_x1_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    e = Engine(spark, root)
    e.create_table(
        "ev_ingest",
        [
            ("event_id", "BIGINT"),
            ("ts", "TIMESTAMP_NTZ"),
            ("user_id", "BIGINT"),
            ("event_type", "TEXT"),
            ("value", "DOUBLE"),
        ],
    )
    src = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # Stable app_id = the SAME logical producer re-delivering; the r12
    # ledger keys on (app_id, epoch), so only this producer's committed
    # epoch 0 is skipped — a different producer's epoch 0 would land.
    for _ in range(2):  # second run = re-delivery of a committed epoch
        q = sink(e, "ev_ingest", src, app_id="events-ingest")
        q.processAllAvailable()
        q.stop()
        src = read_events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    return (
        e.table("ev_ingest")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("n_ids"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )
