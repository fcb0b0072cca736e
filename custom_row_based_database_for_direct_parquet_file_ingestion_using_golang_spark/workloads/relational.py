"""Relational beyond-reference tier: joins, windows, set ops, subqueries.

The reference has none of these (SURVEY.md §2.8 — single-table FROM only,
pkg/handlers/select.go:49-54); they're table stakes for an analytics engine,
expressed as plain Catalyst plans. Scale notes inline per query: small
dimensions are broadcast explicitly, window tie-breaks are unique so results
are deterministic under any partitioning, and the custom as-of/range joins
shuffle exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.joins import asof_join, range_join
from .registry import load, query, r2


# --- equi joins ------------------------------------------------------------


@query(
    "join_revenue_per_nation",
    """
    SELECT n.n_name AS nation, count(*) AS orders, round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dim tables broadcast: nation is tiny (25 rows) and customer is the
    # smaller fact side — at 100 TB orders the broadcast of nation is free
    # and customer⋈orders shuffles on the join key once.
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("orders"), r2(F.sum("o_totalprice"), "revenue"))
        .orderBy("nation")
    )


@query(
    "skew_salted_join",
    """
    WITH li AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1
                            ELSE l_suppkey END AS sk,
                       l_extendedprice, l_discount
                FROM lineitem)
    SELECT s_nationkey, count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM li JOIN supplier ON sk = s_suppkey
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Skew-stress driver row (round-8): HALF of lineitem is remapped onto
    # supplier key 1 — the hot-key histogram AQE's skew-join handles for
    # sort-merge but that kills a plain hash-partitioned join (one reducer
    # gets 50% of the fact table). operators/skew.salted_join spreads the
    # hot key over salt_n=8 reducers: left rows take a random salt, right
    # rows replicate once per salt, the join keys on (sk, salt). The
    # oracle runs the UNSALTED relational join — salting must be
    # result-invariant, so any replication/dedup mistake flips the hash.
    # tests/test_skew_and_stateful.py asserts the salt actually splits the
    # hot key's rows across partitions.
    from ..operators.skew import salted_join

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
    joined = salted_join(li, sup, "sk", salt_n=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                "revenue",
            ),
        )
        .orderBy("s_nationkey")
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate"))
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .select("orderkey", "revenue", F.to_date("o_orderdate").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    # region⋈nation⋈supplier is a tiny dim chain — broadcast it into the
    # lineitem scan; the only big shuffle is lineitem⋈orders⋈customer.
    dim = (
        F.broadcast(region)
        .join(nation, nation.n_regionkey == region.r_regionkey)
        .join(supplier, supplier.s_nationkey == nation.n_nationkey)
    )
    return (
        lineitem.join(F.broadcast(dim), lineitem.l_suppkey == dim.s_suppkey)
        .join(orders, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            customer,
            (customer.c_custkey == orders.o_custkey)
            & (customer.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@query(
    "join_semi_exists",
    """
    SELECT c_mktsegment AS segment, count(*) AS active_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("active_customers"))
        .orderBy("segment")
    )


@query(
    "join_anti_not_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_outer_suppliers_per_nation",
    """
    SELECT n.n_name AS nation, count(s.s_suppkey) AS suppliers
    FROM nation n
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000
    GROUP BY n.n_name ORDER BY nation
    """,
)
def join_outer_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return (
        nation.join(supplier, supplier.s_nationkey == nation.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").alias("suppliers"))
        .orderBy("nation")
    )


# --- window functions ------------------------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
           round(o_totalprice, 2) AS total, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY priority, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-K per group: the canonical scalable pattern — one shuffle on the
    # partition key, per-partition sort, early row_number cutoff
    # (Catalyst plans a WindowGroupLimit before the full sort at K<<n).
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("orderkey"),
            r2(F.col("o_totalprice"), "total"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("priority", "rn")
    )


@query(
    "window_running_revenue",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey < 100
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        r2(F.sum("o_totalprice").over(w), "running_total"),
    )


@query(
    "window_lag_delta",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_vs_prev
    FROM orders
    WHERE o_custkey < 100
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        r2(F.col("o_totalprice") - F.lag("o_totalprice").over(w), "delta_vs_prev"),
    )


# --- set operations --------------------------------------------------------


@query(
    "setop_union_intersect_except",
    """
    WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000),
         big  AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                  WHERE o_totalprice > 450000)
    SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM rich UNION SELECT * FROM big)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT * FROM rich INTERSECT SELECT * FROM big)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT * FROM rich EXCEPT SELECT * FROM big)
    ORDER BY op
    """,
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-16 (guide §2.4): the literal three-branch formulation (UNION
    # DISTINCT / INTERSECT / EXCEPT as independent subtrees) re-scanned
    # customer+orders three times and planned 9 exchanges (audited,
    # plans/r16/setop_union_intersect_except_before.txt). All three set-op
    # cardinalities are functions of ONE per-key membership-flag frame:
    # union both sides tagged, aggregate max(flag) per key (one shuffle,
    # map-side partial), then count |A∪B| / |A∩B| / |A\B| from the flags in
    # a single global aggregate. Set semantics are preserved exactly —
    # UNION/INTERSECT/EXCEPT are distinct-based and NULL-equal, as is
    # groupBy — and the oracle hash pins it (identical rows at every sf).
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    tagged = rich.select(
        "c_custkey", F.lit(True).alias("in_a"), F.lit(False).alias("in_b")
    ).unionByName(
        big.select(
            "c_custkey", F.lit(False).alias("in_a"), F.lit(True).alias("in_b")
        )
    )
    flags = tagged.groupBy("c_custkey").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("u"),
        F.count_if(F.col("in_a") & F.col("in_b")).alias("i"),
        F.count_if(F.col("in_a") & ~F.col("in_b")).alias("e"),
    )
    return counts.selectExpr(
        "stack(3, 'union', u, 'intersect', i, 'except', e) AS (op, n)"
    ).orderBy("op")


# --- subqueries ------------------------------------------------------------


@query(
    "subquery_above_avg",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_sq")
    # Scalar subquery through the SQL surface — Catalyst plans the inner
    # aggregate once and broadcasts the scalar.
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM __orders_sq
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM __orders_sq)
        """
    )


# --- grouping sets ---------------------------------------------------------


@query(
    "rollup_status_priority",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("o_totalprice"), "total"))
        .orderBy(F.col("status").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )


@query(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority AS priority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("priority")
    )


# --- as-of / range joins (custom operators, operators/joins.py) ------------


@query(
    "asof_click_to_purchase",
    """
    WITH purchases AS (
      SELECT user_id, ts, max(event_id) AS purchase_id,
             round(max_by(value, event_id), 2) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            r2(F.max_by("value", "event_id"), "purchase_value"),
        )
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id", "purchase_value"],
    ).select("event_id", "user_id", "purchase_id", "purchase_value")


@query(
    "range_join_follow_events",
    """
    SELECT a.event_type AS first_type, b.event_type AS next_type, count(*) AS pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '300 seconds'
    WHERE a.event_type = 'view'
    GROUP BY a.event_type, b.event_type
    ORDER BY next_type
    """,
)
def range_join_follow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_type"
    )
    all_ev = events.select("user_id", "ts", "event_type")
    joined = range_join(
        views, all_ev, on="user_id", left_ts="ts", right_ts="ts", window_seconds=300
    )
    return (
        joined.groupBy(
            F.col("event_type").alias("first_type"),
            F.col("r_event_type").alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy("next_type")
    )


# --- additional TPC-H-shaped queries ---------------------------------------


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure scan+filter+global-agg: the shape where pushdown does all the
    # work — every predicate reaches the parquet reader.
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(r2(F.sum(F.col("l_extendedprice") * F.col("l_discount")), "revenue"))


@query(
    "q14_promo_revenue_share",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c.c_name, o.o_orderkey, round(t.total_qty, 2) AS total_qty,
           round(o.o_totalprice, 2) AS total_price
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(customer, customer.c_custkey == orders.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            r2(F.col("total_qty"), "total_qty"),
            r2(F.col("o_totalprice"), "total_price"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


@query(
    "agg_count_distinct",
    """
    SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact distinct counts (expand + two-phase agg under the hood);
    # approx_count_distinct is the at-scale alternative (not oracle-
    # comparable across engines, so the exact form is checked here).
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentiles",
    """
    SELECT o_orderpriority AS priority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (F.percentile ≡ SQL quantile_cont
    # definition: both interpolate at (n-1)*p over the sorted values, so the
    # doubles match bit-for-bit). percentile_approx is the 100 TB variant —
    # not oracle-comparable across engines, so the exact form is checked.
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        )
        .orderBy("priority")
    )


@query(
    "q4_priority_with_exists",
    """
    SELECT o_orderpriority AS priority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def q4_priority_with_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@query(
    "q7_nation_trade_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
        OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8") | (
        F.col("supp_nation") == "NATION_8"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(customer, customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_revenue_top20",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), nation.n_nationkey == customer.c_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q13_orders_per_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority != '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_orders_per_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "window_ntile_quartiles",
    """
    SELECT quartile, count(*) AS n, round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
      FROM orders
    ) GROUP BY quartile ORDER BY quartile
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: an unpartitioned ntile window sorts on a single task — fine for
    # a quartile report, an anti-pattern for 100 TB inputs. The at-scale
    # equivalent is approx_percentile boundaries + a range join (or
    # repartitionByRange + per-partition rank offsets); kept here because
    # the oracle checks exact ntile semantics.
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_totalprice", F.ntile(4).over(w).cast("int").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.min("o_totalprice"), "lo"),
            r2(F.max("o_totalprice"), "hi"),
        )
        .orderBy("quartile")
    )


@query(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM (
      SELECT p.p_partkey, s.s_name, s.s_acctbal,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size = 15
    ) WHERE rn = 1
    ORDER BY p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q2's correlated "supplier with best metric per part" expressed as a
    # window top-1 instead of a correlated subquery — one shuffle on
    # partkey, no re-scan (the classic decorrelation rewrite).
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        F.broadcast(part)
        .join(li, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), supplier.s_suppkey == li.l_suppkey)
        .select("p_partkey", "s_name", "s_acctbal", "s_suppkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "s_name", r2(F.col("s_acctbal"), "acctbal"))
        .orderBy("p_partkey")
    )


@query(
    "q15_top_suppliers",
    """
    WITH revenue AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.rev, 2) AS total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY r.rev DESC, s.s_suppkey LIMIT 1
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supplier = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    # Top-1 by the UNROUNDED value with a unique tie-break: equality against
    # a rounded max would turn a half-cent cross-engine rounding divergence
    # into a row-membership mismatch. TakeOrderedAndProject keeps this a
    # single-pass top-k, no extra shuffle.
    return (
        revenue.join(supplier, supplier.s_suppkey == revenue.l_suppkey)
        .select("s_suppkey", "s_name", r2(F.col("rev"), "total_revenue"), F.col("rev"))
        .orderBy(F.col("rev").desc(), F.col("s_suppkey"))
        .limit(1)
        .drop("rev")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (
      SELECT l_partkey, 0.8 * avg(l_quantity) AS qty_bar
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_bar
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bars = li.groupBy(F.col("l_partkey").alias("bk")).agg(
        (F.avg("l_quantity") * 0.8).alias("qty_bar")
    )
    return (
        li.join(bars, li.l_partkey == bars.bk)
        .filter(F.col("l_quantity") < F.col("qty_bar"))
        .agg(r2(F.sum("l_extendedprice") / 7.0, "avg_yearly"))
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment AS segment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    # Threshold rounded to 2dp on both sides: an unrounded cross-engine avg
    # can differ by ULPs and flip membership for a boundary customer.
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            r2(F.sum("c_acctbal"), "totacctbal"),
        )
        .orderBy("segment")
    )


@query(
    "q8_market_share",
    """
    SELECT yr, round(100.0 * sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / sum(volume), 2) AS mkt_share_pct
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY yr ORDER BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 shape (national market share): one fact-fact shuffle
    # (lineitem⋈orders), everything else broadcast. part/supplier/nation/
    # region prune lineitem rows *before* the big join; customer⋈orders
    # rides the same orderkey/custkey shuffles Catalyst plans. Conditional
    # share = sum(CASE)/sum — a single aggregate pass, no self-join.
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supplier = load(spark, sf_dir, "supplier")
    cust_dim = (
        customer.join(F.broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    supp_dim = supplier.join(
        F.broadcast(n2), supplier.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust_dim), F.col("c_custkey") == orders.o_custkey)
        .join(F.broadcast(supp_dim), F.col("s_suppkey") == li.l_suppkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            r2(
                100.0
                * F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                "mkt_share_pct",
            )
        )
        .orderBy("yr")
    )


@query(
    "q9_nation_profit",
    """
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS yr,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY n.n_name, yr
    ORDER BY nation, yr DESC
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 shape (product-type profit). No partsupp table in the
    # fixture, so supply cost is proxied as 0.6·p_retailprice — same join
    # graph and measure structure. part filter broadcast into the lineitem
    # scan kills ~5/6 of rows before the one orders shuffle.
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), F.col("s_suppkey") == li.l_suppkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(r2(F.sum(profit), "profit"))
        .orderBy(F.col("nation"), F.col("yr").desc())
    )


@query(
    "q11_important_parts",
    """
    WITH supplied AS (
      SELECT l.l_partkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_12'
    )
    , pp AS (SELECT l_partkey, sum(l_extendedprice) AS v
             FROM supplied GROUP BY l_partkey)
    SELECT l_partkey AS partkey, round(v, 2) AS value
    FROM pp
    WHERE round(v, 2) > round(
      (SELECT sum(v) FROM pp) / (SELECT count(*) FROM pp) * 2.0, 2)
    ORDER BY v DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape (important stock): per-key aggregate filtered by a
    # scalar-subquery threshold over the global distribution. Real Q11
    # uses total * FRACTION with FRACTION scaled by 1/SF; a fixed fraction
    # goes vacuous as part count grows (0 rows at sf0.1), so the threshold
    # here is the scale-free 2.0x the MEAN per-part value (12/32/1227 rows
    # at sf0.001/0.01/0.1). The global stats are re-aggregated from the
    # (tiny, one-row-per-partkey) per-part result — which is cached so
    # lineitem is scanned ONCE, not once per branch — then broadcast into
    # the filter. Threshold comparison is on 2dp-rounded values on both
    # sides (q22 precedent: ULP-level cross-engine sum divergence must not
    # flip membership).
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    supplied = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("l_partkey", "l_extendedprice")
    )
    per_part = supplied.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    per_part = per_part.cache()
    # operand order mirrors the oracle: sum / count * 2.0, then round.
    total = per_part.agg(
        F.round(
            F.sum("raw_value") / F.count(F.lit(1)) * F.lit(2.0), 2
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.round(F.col("raw_value"), 2) > F.col("threshold"))
        .orderBy(F.col("raw_value").desc(), F.col("l_partkey"))
        .select(F.col("l_partkey").alias("partkey"), r2(F.col("raw_value"), "value"))
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l.l_returnflag AS flag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY flag ORDER BY flag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape (shipping modes / late lines). The fixture has no
    # l_shipmode or commit/receipt dates, so "mode" = l_returnflag and
    # "late" = shipped >60 days after order date — same join + dual
    # conditional-count structure. The non-equi lateness predicate is a
    # post-join filter on the single orderkey shuffle; the shipdate range
    # is pushed to the parquet scan.
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("flag")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY brand, type, size
    ORDER BY supplier_cnt DESC, brand, type, size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape (supplier relationships per part attribute): the
    # lineitem fact stands in for partsupp; "complaint" suppliers =
    # negative account balance, excluded with a broadcast anti-join (the
    # NOT IN is safe to rewrite: s_suppkey is non-null). count(DISTINCT)
    # shuffles once on the grouping key; part filter broadcast-prunes first.
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    li = load(spark, sf_dir, "lineitem")
    bad_suppliers = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_suppliers), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size")
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape (three OR'd brand/size/quantity branches; container
    # predicates become p_size ranges — no p_container in the fixture).
    # Catalyst extracts the common l_quantity<=30-ish bounds it can and
    # pushes the per-side conjuncts below the join (part side: brand/size;
    # lineitem side: quantity envelope), so the broadcast join sees
    # pre-filtered inputs despite the disjunction.
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return joined.filter(
        branch("Brand#12", 5, 1, 11)
        | branch("Brand#23", 10, 10, 20)
        | branch("Brand#34", 15, 20, 30)
    ).agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))


@query(
    "q20_excess_volume_suppliers",
    """
    SELECT s.s_name AS name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_8'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'SMALL'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 100
      )
    ORDER BY name
    """,
)
def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q20 shape (nested IN over an aggregated subquery): suppliers in
    # one nation who shipped >100 units of SMALL parts in 1997 (availqty
    # threshold adapted — no partsupp). The inner aggregate reduces
    # lineitem to one row per supplier BEFORE the semi-join, so the join
    # probe side is tiny; part + date filters prune the scan first.
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(heavy), supplier.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_name").alias("name"), r2(F.col("s_acctbal"), "acctbal"))
        .orderBy("name")
    )


@query(
    "q21_sole_late_suppliers",
    """
    SELECT s.s_name AS name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY name ORDER BY numwait DESC, name LIMIT 20
    """,
)
def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape (suppliers who alone kept F-status orders waiting;
    # "late" = shipped >90 days after order date — no receipt/commit dates
    # in the fixture). The double correlated EXISTS/NOT EXISTS is
    # decorrelated into ONE window pass over the orderkey partition:
    # distinct-supplier and distinct-late-supplier sets per order replace
    # two re-scans of lineitem — one shuffle total vs three in the naive
    # plan, the decisive rewrite at 100 TB.
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .withColumn("is_late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "name")
        .limit(20)
    )


@query(
    "profile_orders",
    """WITH p AS (
  SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
         count(*) - count(o_orderkey) AS n_nulls, count(DISTINCT o_orderkey) AS n_distinct,
         CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num,
         CAST(sum(CAST(o_orderkey AS DECIMAL(38,9))) AS DOUBLE) / count(o_orderkey) AS mean,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
         count(*) - count(o_custkey) AS n_nulls, count(DISTINCT o_custkey) AS n_distinct,
         CAST(min(o_custkey) AS DOUBLE) AS min_num, CAST(max(o_custkey) AS DOUBLE) AS max_num,
         CAST(sum(CAST(o_custkey AS DECIMAL(38,9))) AS DOUBLE) / count(o_custkey) AS mean,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus' AS column_name, count(*) AS n_rows,
         count(*) - count(o_orderstatus) AS n_nulls, count(DISTINCT o_orderstatus) AS n_distinct,
         CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         CAST(NULL AS DOUBLE) AS mean,
         CAST(min(o_orderstatus) AS VARCHAR) AS min_str, CAST(max(o_orderstatus) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_totalprice' AS column_name, count(*) AS n_rows,
         count(*) - count(o_totalprice) AS n_nulls, count(DISTINCT o_totalprice) AS n_distinct,
         CAST(min(o_totalprice) AS DOUBLE) AS min_num, CAST(max(o_totalprice) AS DOUBLE) AS max_num,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE) / count(o_totalprice) AS mean,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_orderdate' AS column_name, count(*) AS n_rows,
         count(*) - count(o_orderdate) AS n_nulls, count(DISTINCT o_orderdate) AS n_distinct,
         CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         CAST(NULL AS DOUBLE) AS mean,
         CAST(min(o_orderdate) AS VARCHAR) AS min_str, CAST(max(o_orderdate) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority' AS column_name, count(*) AS n_rows,
         count(*) - count(o_orderpriority) AS n_nulls, count(DISTINCT o_orderpriority) AS n_distinct,
         CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         CAST(NULL AS DOUBLE) AS mean,
         CAST(min(o_orderpriority) AS VARCHAR) AS min_str, CAST(max(o_orderpriority) AS VARCHAR) AS max_str
  FROM orders
)
SELECT column_name, n_rows, n_nulls, n_distinct, min_num, max_num,
       CAST(round(CAST(mean AS DECIMAL(20,9)), 4) AS DOUBLE) AS mean,
       min_str, max_str
FROM p ORDER BY column_name
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SUMMARIZE-class column profile of the orders table: one long-format
    # row per column (counts, nulls, exact distinct, numeric min/max/mean,
    # temporal/string min/max). The oracle re-derives every field with
    # per-column UNION ALL aggregates; the mean is decimal-summed on both
    # sides (order-free) and rounded through the DECIMAL(20,9) snap so
    # engine tie-rounding cannot flip it. One Spark aggregate job — the
    # multi-distinct plan is a single Expand pass, not one job per column.
    from ..operators.profile import profile

    orders = load(spark, sf_dir, "orders")
    prof = profile(orders)
    return (
        prof.select(
            F.col("column").alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_num",
            "max_num",
            F.round(F.col("mean").cast("decimal(20,9)"), 4)
            .cast("double")
            .alias("mean"),
            "min_str",
            "max_str",
        )
        .orderBy("column_name")
    )


@query(
    "histogram_totalprice",
    """
    WITH params AS (SELECT 0.0 AS lo, 500000.0 AS hi, 20 AS bins,
                           (500000.0 - 0.0) / 20 AS width),
    counts AS (
      SELECT least(bins - 1,
                   CAST(floor((CAST(o_totalprice AS DOUBLE) - lo) / width)
                        AS INT)) AS bucket,
             count(*) AS n
      FROM orders CROSS JOIN params
      WHERE CAST(o_totalprice AS DOUBLE) >= lo
        AND CAST(o_totalprice AS DOUBLE) <= hi
      GROUP BY 1),
    grid AS (SELECT CAST(unnest(generate_series(0, bins - 1)) AS INT) AS bucket
             FROM params)
    SELECT g.bucket, lo + g.bucket * width AS lo,
           lo + (g.bucket + 1) * width AS hi, coalesce(c.n, 0) AS n
    FROM grid g CROSS JOIN params LEFT JOIN counts c ON c.bucket = g.bucket
    ORDER BY g.bucket
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi-width 20-bucket histogram of order totals over an EXPLICIT
    # [0, 500000] range: the bucketing expression is row-local double
    # arithmetic on literals (identical IEEE ops in the oracle), empty
    # buckets surface via the generated grid, and the closed upper edge
    # folds hi into the last bucket on both sides.
    from ..operators.profile import histogram

    orders = load(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", bins=20, lo=0.0, hi=500000.0)


@query(
    "corr_lineitem",
    """
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)
  UNION ALL
  SELECT 'l_quantity' AS col_x, 'l_discount' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL)
  UNION ALL
  SELECT 'l_quantity' AS col_x, 'l_tax' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_quantity IS NOT NULL AND l_tax IS NOT NULL)
  UNION ALL
  SELECT 'l_extendedprice' AS col_x, 'l_discount' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL)
  UNION ALL
  SELECT 'l_extendedprice' AS col_x, 'l_tax' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_tax IS NOT NULL)
  UNION ALL
  SELECT 'l_discount' AS col_x, 'l_tax' AS col_y, cnt AS n,
         CASE WHEN sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy) <> 0
              THEN round((nd * sxy - sx * sy)
                         / (sqrt(nd * sxx - sx * sx)
                            * sqrt(nd * syy - sy * sy)), 6)
         END AS corr
  FROM (
    SELECT count(*) AS cnt, CAST(count(*) AS DOUBLE) AS nd,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(CAST(l_tax AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS syy,
           CAST(sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_tax AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM lineitem WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL)
  ORDER BY col_x, col_y
    """,
)
def corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairwise Pearson correlations over the lineitem measures in one
    # aggregate job. The sufficient statistics are DECIMAL(38,12) sums
    # (order-free — `F.corr` would accumulate floats in partition order),
    # and the closed form runs the identical IEEE operation sequence as
    # the oracle before round(6).
    from ..operators.profile import corr_matrix

    li = load(spark, sf_dir, "lineitem")
    cm = corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    return cm.select(
        "col_x", "col_y", "n", F.round("corr", 6).alias("corr")
    ).orderBy("col_x", "col_y")


@query(
    "cube_status_priority",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUBE = all 2^k grouping sets in one pass (Catalyst expands to a
    # single Expand + aggregate — not k separate scans).
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("status").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )
