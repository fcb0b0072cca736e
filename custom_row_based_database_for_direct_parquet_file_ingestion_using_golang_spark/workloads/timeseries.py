"""Hypertable-tier workloads: time_bucket rollup, gapfill (LOCF / linear
interpolation), and OHLC candles over the events table.

Oracles mirror the exact arithmetic in DuckDB: ``time_bucket`` floors to
the epoch the same way as the integer-microsecond Spark column, LOCF is
``last_value(x IGNORE NULLS)`` over the same grid, the linear interpolation
formula is written with the identical operation order on both sides
(`pv + (nv - pv) * ((t - pt) / (nt - pt))` on epoch-microsecond doubles),
averages are summed in DECIMAL (order-free), and the final round-to-2 goes
through a DECIMAL(20,9) snap (see ``_r2d``) so engine rounding-mode
differences on .xx5 ties cannot flip a cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import timeseries as ts
from .registry import load, query

# Exact order-insensitive bucket average: double sums are order-dependent in
# the low bits, and a LOCF'd / interpolated value sitting on a .xx5 rounding
# boundary then flips between engines. Summing in DECIMAL is exact (and
# therefore order-free); the single cast back to DOUBLE and the divide are
# deterministic, so both engines feed identical doubles into round(2).
def _avg_v():
    # Built lazily — Column construction needs an active SparkContext.
    return (
        F.sum(F.col("value").cast("decimal(20,9)")).cast("double")
        / F.count(F.lit(1))
    ).alias("v")


def _r2d(col, alias: str):
    # round-to-2 that agrees across engines ON TIES: fixture values carry 2
    # decimals, so bucket averages land exactly on .xx5, where Spark
    # (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
    # (round(x*100)/100 on the binary double, which sits a hair BELOW .xx5)
    # round to different cents. Going through DECIMAL(20,9) first snaps the
    # double to its shortest decimal form identically in both engines
    # (value error ~1e-14 « the 5e-10 snap radius), making the final
    # half-away-from-zero round deterministic. The SQL twin is
    # ``CAST(round(CAST(x AS DECIMAL(20,9)), 2) AS DOUBLE)``.
    return F.round(F.col(col).cast("decimal(20,9)"), 2).cast("double").alias(alias)


@query(
    "ts_gapfill_locf",
    """
    WITH b AS (SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS slot,
                      CAST(sum(CAST(value AS DECIMAL(20,9))) AS DOUBLE) / count(*)
                        AS v
               FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(slot) AS s0, max(slot) AS s1 FROM b),
    grid AS (SELECT g.slot AS slot, t.event_type AS event_type
             FROM (SELECT unnest(generate_series(s0, s1, INTERVAL '5 minutes'))
                     AS slot FROM bounds) g
             CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
    f AS (SELECT grid.event_type, grid.slot, (b.v IS NOT NULL) AS observed,
                 last_value(b.v IGNORE NULLS) OVER (
                     PARTITION BY grid.event_type ORDER BY grid.slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
          FROM grid LEFT JOIN b
            ON b.event_type = grid.event_type AND b.slot = grid.slot)
    SELECT event_type, slot, observed,
           CAST(round(CAST(fv AS DECIMAL(20,9)), 2) AS DOUBLE) AS avg_value_locf
    FROM f
    WHERE slot >= TIMESTAMP '2024-01-05' AND slot < TIMESTAMP '2024-01-06'
    ORDER BY event_type, slot
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TimescaleDB-style `time_bucket_gapfill + locf()`: 5-minute avg(value)
    # per event_type, dense grid over the global span, last observation
    # carried forward. LOCF runs over the FULL month (a carried value can
    # originate days earlier), then one day is sliced for the gate — so a
    # wrong grid bound, join key, or window frame anywhere in the month
    # shifts the carried values inside the slice and flips the hash.
    events = load(spark, sf_dir, "events")
    rolled = ts.rollup(events, "ts", 300, ["event_type"], [_avg_v()])
    filled = ts.gapfill(rolled, "slot", ["event_type"], ["v"], 300, method="locf")
    return (
        filled.filter(
            (F.col("slot") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("slot") < F.lit("2024-01-06").cast("timestamp"))
        )
        .select(
            "event_type",
            "slot",
            "observed",
            _r2d("v", "avg_value_locf"),
        )
        .orderBy("event_type", "slot")
    )


@query(
    "ts_linear_interpolate",
    """
    WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS slot,
                      CAST(sum(CAST(value AS DECIMAL(20,9))) AS DOUBLE) / count(*)
                        AS v
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
    bounds AS (SELECT min(slot) AS s0, max(slot) AS s1 FROM b),
    grid AS (SELECT unnest(generate_series(s0, s1, INTERVAL '1 hour')) AS slot
             FROM bounds),
    f AS (SELECT grid.slot, b.v, (b.v IS NOT NULL) AS observed,
                 CAST(epoch_us(grid.slot) AS DOUBLE) AS t,
                 last_value(b.v IGNORE NULLS) OVER w0 AS pv,
                 first_value(b.v IGNORE NULLS) OVER w1 AS nv,
                 last_value(CASE WHEN b.v IS NOT NULL
                            THEN CAST(epoch_us(grid.slot) AS DOUBLE) END
                            IGNORE NULLS) OVER w0 AS pt,
                 first_value(CASE WHEN b.v IS NOT NULL
                             THEN CAST(epoch_us(grid.slot) AS DOUBLE) END
                             IGNORE NULLS) OVER w1 AS nt
          FROM grid LEFT JOIN b USING (slot)
          WINDOW w0 AS (ORDER BY grid.slot
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 w1 AS (ORDER BY grid.slot
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT slot, observed,
           CAST(round(CAST(CASE WHEN observed THEN v
                                ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END
                           AS DECIMAL(20,9)), 2) AS DOUBLE) AS avg_value_interp
    FROM f ORDER BY slot
    """,
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `interpolate()`-style gapfill: hourly avg(value) for one event type,
    # gaps filled by linear interpolation between the bracketing
    # observations on the microsecond time axis. No extrapolation: slots
    # outside [first, last] observation stay NULL (none exist here — the
    # grid bounds ARE observation buckets). The full 720-slot series is the
    # gate output; the Spark expression and the oracle SQL share one
    # operation order so the doubles agree exactly before round(2).
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    rolled = ts.rollup(events, "ts", 3600, [], [_avg_v()])
    filled = ts.gapfill(rolled, "slot", [], ["v"], 3600, method="linear")
    return filled.select(
        "slot", "observed", _r2d("v", "avg_value_interp")
    ).orderBy("slot")


@query(
    "ts_ohlc_daily",
    """
    SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
           round(arg_min(value, ts), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(arg_max(value, ts), 2) AS close,
           count(*) AS n_events
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candlestick rollup (the other canonical hypertable aggregate): daily
    # open/high/low/close per event_type. open/close are min_by/max_by on
    # the event timestamp — fixture timestamps are unique per type-day at
    # microsecond grain (10k events / 150 cells), so the argmin is
    # deterministic; DuckDB's arg_min/arg_max mirror it. One shuffle,
    # map-side partial agg for all five measures.
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type", ts.time_bucket("ts", 86400).alias("day")
        )
        .agg(
            F.round(F.min_by("value", "ts"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", "ts"), 2).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_funnel_steps",
    """
    WITH a AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t_view
      GROUP BY e.user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN b ON e.user_id = b.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS step_view,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS step_click,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS step_purchase,
           round(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM a), 4) + 0.0 AS conversion
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (round 8): users who VIEWED, then CLICKED strictly
    after their first view, then PURCHASED strictly after that first
    click — the sequential-event analytics shape (onboarding funnels,
    attribution). Each step is a per-user MIN over a filtered, step-
    gated event set: three aggregations on the SAME key, so after the
    first shuffle the per-user joins are co-partitioned and Catalyst
    reuses the partitioning rather than reshuffling. The oracle replays
    the identical step chain; the conversion ratio is rational
    arithmetic over exact counts (4 dp convention)."""
    ev = load(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    b = (
        ev.filter(F.col("event_type") == "click")
        .join(a, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    c = (
        ev.filter(F.col("event_type") == "purchase")
        .join(b, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    na = a.agg(F.count(F.lit(1)).cast("bigint").alias("step_view"))
    nb = b.agg(F.count(F.lit(1)).cast("bigint").alias("step_click"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("step_purchase"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "step_view",
            "step_click",
            "step_purchase",
            (
                F.round(
                    F.col("step_purchase").cast("double")
                    / F.col("step_view"),
                    4,
                )
                + F.lit(0.0)
            ).alias("conversion"),
        )
    )


@query(
    "events_cohort_retention",
    """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
               FROM events GROUP BY user_id),
    d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    j AS (SELECT f.cohort_day,
                 date_diff('day', f.cohort_day, d.day) AS offset_days,
                 d.user_id
          FROM d JOIN f ON d.user_id = f.user_id),
    r AS (SELECT cohort_day, offset_days,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
          FROM j WHERE offset_days IN (0, 1, 7, 14) GROUP BY 1, 2),
    s AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM f GROUP BY 1)
    SELECT r.cohort_day, r.offset_days, r.active_users, s.cohort_size,
           round(CAST(active_users AS DOUBLE) / cohort_size, 4) + 0.0
             AS retention
    FROM r JOIN s ON r.cohort_day = s.cohort_day
    ORDER BY r.cohort_day, r.offset_days
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (round 8): users grouped by first-activity day,
    measured active again at day offsets 0/1/7/14 — the product-
    analytics matrix. Two aggregations on user_id (first day, distinct
    active days) share one shuffle key; the retention join is per
    cohort-day (tiny — broadcastable at any scale since cohorts are
    bounded by the date range, not the user count). Rates are rational
    over exact counts (4 dp)."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    j = d.join(f, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("offset_days"),
        "user_id",
    )
    r = (
        j.filter(F.col("offset_days").isin(0, 1, 7, 14))
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    s = f.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        r.join(F.broadcast(s), "cohort_day")
        .select(
            "cohort_day",
            "offset_days",
            "active_users",
            "cohort_size",
            (
                F.round(
                    F.col("active_users").cast("double")
                    / F.col("cohort_size"),
                    4,
                )
                + F.lit(0.0)
            ).alias("retention"),
        )
        .orderBy("cohort_day", "offset_days")
    )


@query(
    "events_transition_matrix",
    """
    WITH nxt AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM nxt WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, c.n,
           round(CAST(c.n AS DOUBLE) / tot.t, 4) + 0.0 AS p
    FROM c JOIN tot ON c.cur = tot.cur
    ORDER BY c.cur, c.nxt
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (round 8): P(next | current) per user
    stream — the Markov-chain view of behavioral sequences (what follows
    a view? how often does click lead to purchase?). One window over the
    (user, time) sort computes every transition; the probabilities are
    rational arithmetic over exact counts (4 dp convention). Plan: ONE
    shuffle for the window, partial-aggregated counts, broadcast row
    totals."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = nxt.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("cur").agg(F.sum("n").cast("bigint").alias("t"))
    return (
        c.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            (F.round(F.col("n").cast("double") / F.col("t"), 4) + F.lit(0.0))
            .alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "events_rfm_segments",
    """
    WITH p AS (
      SELECT user_id,
             CAST(date_diff('second', MAX(ts),
                  TIMESTAMP '2024-02-01 00:00:00') AS BIGINT) AS rec_s,
             CAST(COUNT(*) AS BIGINT) AS freq,
             round(SUM(CAST(value AS DECIMAL(20,2))), 2) + 0.0 AS mon
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    t AS (
      SELECT user_id,
             NTILE(4) OVER (ORDER BY rec_s, user_id) AS r_tile,
             NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f_tile,
             NTILE(4) OVER (ORDER BY mon DESC, user_id) AS m_tile
      FROM p
    )
    SELECT r_tile, f_tile, m_tile, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (round 8): recency / frequency / monetary
    quartiles over each user's purchase history — the classic customer-
    value matrix. Recency is integer seconds to a fixed anchor (no
    wall-clock: deterministic and oracle-replayable); monetary sums run
    in DECIMAL and quartile ORDER BYs carry a user_id tiebreak, so the
    NTILE assignment is bit-stable across engines. Plan: one shuffle for
    the per-user aggregate; the three NTILEs share one tiny frame
    (users-with-purchases) — the window sorts are per-quartile-dimension
    over that reduced set, not the event stream."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    anchor = F.lit("2024-02-01 00:00:00").cast("timestamp")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (anchor.cast("long") - F.max("ts").cast("long"))
            .cast("bigint")
            .alias("rec_s"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            (
                F.round(F.sum(F.col("value").cast("decimal(20,2)")), 2)
                .cast("double")
                + F.lit(0.0)
            ).alias("mon"),
        )
    )
    t = p.select(
        "user_id",
        F.ntile(4).over(W.orderBy("rec_s", "user_id")).alias("r_tile"),
        F.ntile(4).over(W.orderBy(F.desc("freq"), "user_id")).alias("f_tile"),
        F.ntile(4).over(W.orderBy(F.desc("mon"), "user_id")).alias("m_tile"),
    )
    return (
        t.groupBy("r_tile", "f_tile", "m_tile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("r_tile", "f_tile", "m_tile")
    )


@query(
    "events_ohlc_bars",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           arg_min(value, ts) AS open, max(value) AS high,
           min(value) AS low, arg_max(value, ts) AS close,
           count(*) AS n_events
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9: OHLC bars — the time-series resample every metrics store
    # ships (open/high/low/close per day per series), expressed with the
    # new selector aggregates through the dialect: open/close are
    # ARG_MIN/ARG_MAX of value keyed on ts. Deterministic because event
    # timestamps are globally UNIQUE at every fixture scale (verified
    # sf0.001/0.01/0.1) — on real data, key on a (ts, id) composite.
    # Delivered unrounded: every output is an exact input double (no
    # arithmetic), bit-identical cross-engine. date_trunc is the same
    # function name and semantics in Spark and DuckDB, so the dialect SQL
    # and the oracle SQL are the identical text.
    from .core import _ref_select

    return _ref_select(
        spark,
        sf_dir,
        "SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day, "
        "ARG_MIN(value, ts) AS open, MAX(value) AS high, "
        "MIN(value) AS low, ARG_MAX(value, ts) AS close, "
        "COUNT(*) AS n_events "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    )


@query(
    "events_user_lifetime",
    """
    SELECT user_id,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS days_active,
           CAST(count(*) AS BIGINT) AS n_events,
           arg_max(event_type, ts) AS last_event_type
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def events_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9: per-user lifetime profile — first/last activity, active
    # span in days, event count, and the LAST action (arg_max keyed on
    # the globally-unique ts). The retention-analysis base table every
    # events pipeline materializes. date_diff('day', a, b) is whole-day
    # truncation on both engines (Spark datediff(DATE(b), DATE(a)) —
    # mirrored explicitly below).
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.datediff(
                F.to_date(F.max("ts")), F.to_date(F.min("ts"))
            ).cast("long").alias("days_active"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("max_by(event_type, ts)").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


@query(
    "events_gini_concentration",
    """
    WITH u AS (
      SELECT user_id, round(sum(value), 2) AS total
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT total,
             row_number() OVER (ORDER BY total, user_id) AS i,
             count(*) OVER () AS n,
             sum(total) OVER () AS s
      FROM u
    )
    SELECT round(2.0 * sum(i * total) / (max(n) * max(s))
                 - (max(n) + 1.0) / max(n), 4) + 0.0 AS gini,
           CAST(max(n) AS BIGINT) AS n_users
    FROM r
    """,
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9: Gini coefficient of per-user event value — the standard
    # concentration measure ("do 10% of users generate 90% of value?")
    # via the rank formula G = 2*Σ(i·xᵢ)/(n·Σx) − (n+1)/n over totals
    # sorted ascending (user_id breaks ties, totalizing the rank). The
    # per-user totals round to 2 dp first (sums of 2-dp inputs are exact
    # multiples of 0.01), so both engines rank identical values; the
    # final expression is two exact divisions, rounded 4 dp.
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    w = W.orderBy("total", "user_id")
    r = u.select(
        "total",
        F.row_number().over(w).alias("i"),
    )
    return r.agg(
        (
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("total"))
                / (F.count(F.lit(1)) * F.sum("total"))
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0)
        ).alias("gini"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "events_hourly_anomaly_zscore",
    """
    WITH h AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ws,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, ws, n,
             avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS mu,
             stddev(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS sd
      FROM h
    )
    SELECT event_type, ws, n,
           round((n - mu) / sd, 4) + 0.0 AS z
    FROM s WHERE sd > 0 ORDER BY event_type, ws
    """,
)
def events_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9: volume-anomaly monitoring — per-hour event counts z-scored
    # against their type's own distribution (the pipeline-health check
    # every ingestion service runs; threshold downstream at |z| > 3).
    # Counts are exact ints; mean/sample-stddev carry only accumulation
    # ULP, absorbed by the 4-dp rounding (the robust_scale precedent).
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ws")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type")
    s = h.select(
        "event_type",
        "ws",
        "n",
        F.avg(F.col("n").cast("double")).over(w).alias("mu"),
        F.stddev(F.col("n").cast("double")).over(w).alias("sd"),
    )
    return (
        s.filter(F.col("sd") > 0)
        .select(
            "event_type",
            "ws",
            "n",
            (
                F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4)
                + F.lit(0.0)
            ).alias("z"),
        )
        .orderBy("event_type", "ws")
    )


@query(
    "events_dau_wau_stickiness",
    """
    WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    dau AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM e GROUP BY d),
    sup AS (
      SELECT d + CAST(k AS INT) AS day, user_id
      FROM e, (SELECT unnest(range(0, 7)) AS k) t
    ),
    wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM sup GROUP BY day)
    SELECT dau.d AS day, dau.dau, wau.wau,
           dau.dau / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.day
    ORDER BY day
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-9: DAU/WAU stickiness — daily actives over trailing-7-day
    # actives per day, the standard engagement ratio. The trailing
    # distinct count avoids a range self-join: each (day, user) supports
    # the WAU of days d..d+6, so ONE explode-by-7 + count distinct gives
    # every trailing window (row growth exactly 7x the distinct
    # (day, user) pairs — bounded, shuffle on day). Stickiness is one
    # IEEE division of exact integers, delivered UNROUNDED (bit-identical
    # cross-engine; a decimal rounding could land on rational knife
    # edges — the LOO-encoding lesson).
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    dau = e.groupBy("d").agg(F.count_distinct("user_id").alias("dau"))
    sup = e.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = sup.groupBy("day").agg(F.count_distinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau["d"] == wau["day"])
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            (F.col("dau") / F.col("wau").cast("double")).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "events_peak_hour_by_type",
    """
    WITH h AS (SELECT event_type, hour(ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM events GROUP BY event_type, hour(ts)),
    r AS (SELECT event_type, hr, cnt,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cnt DESC, hr) AS rn
          FROM h)
    SELECT event_type, hr, cnt FROM r WHERE rn = 1
    """,
)
def events_peak_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak traffic hour per event type (round 10) — the capacity-planning
    report: hourly counts, then rank-1 per type with the (cnt DESC, hr)
    tiebreak making the pick total. Runs through the DIALECT (CTE +
    window + filter); DuckDB runs the IDENTICAL text. One shuffle for the
    hourly aggregate (bounded by types x 24) + one for the tiny window."""
    from .core import _ref_select

    return _ref_select(
        spark,
        sf_dir,
        "WITH h AS (SELECT event_type, HOUR(ts) AS hr, COUNT(*) AS cnt "
        "FROM events GROUP BY event_type, HOUR(ts)), "
        "r AS (SELECT event_type, hr, cnt, "
        "ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY cnt DESC, hr) AS rn FROM h) "
        "SELECT event_type, hr, cnt FROM r WHERE rn = 1",
    )


_TEMPORAL_FAMILY_SQL = (
    "SELECT date_trunc('week', ts) AS wk, "
    "CAST(date_part('dow', ts) AS BIGINT) AS dow, "
    "strftime(MIN(ts), '%Y-%m-%d %H:%M') AS first_seen, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(MAX(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts)) "
    "AS BIGINT) AS max_hours "
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
)


@query("refsql_temporal_family", _TEMPORAL_FAMILY_SQL)
def refsql_temporal_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-14: the temporal scalar family through the dialect, oracle =
    # the IDENTICAL SQL running natively in DuckDB (the JSON-family
    # pattern). One statement exercises the probed closures end-to-end:
    # date_trunc('week') → DATE (the r10 documented drift, now closed),
    # date_part('dow') Sunday=0 (Spark's dayofweek is Sunday=1),
    # strftime %-codes translated to Spark datetime patterns over a
    # wrapped aggregate, and boundary-counting date_diff('hour') (DuckDB
    # counts hour-boundary crossings, not complete elapsed units) inside
    # MAX over the exact floor-division construction. Entered by the
    # round-14 one-for-one registry swap retiring ann_quantized_top10
    # (rows-only; redundant by composition — see workloads/scale.py).
    # Scale shape: scan-stage Column algebra + ONE hash aggregate on
    # (week, dow) — no UDFs, no extra exchanges; the rewrites are
    # token-level and compile to the same whole-stage-codegen plan
    # Catalyst gives hand-written Spark SQL.
    from .core import _ref_select

    return _ref_select(spark, sf_dir, _TEMPORAL_FAMILY_SQL)
