"""Approximate-sketch accuracy pins: at 100 TB the exact operators
(count distinct, percentile) get swapped for their sketch versions
(HyperLogLog++, KLL/GK) — these tests pin the swap's error envelope on the
fixture data so the scale path's accuracy claim is measured, not asserted.

No driver entries: sketch estimates are implementation-specific (Spark
HLL++ vs DuckDB's HLL disagree by design), so cross-engine value-hash
oracles are impossible — accuracy-vs-exact is the right contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.registry import (
    load,
)


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.15 * row["exact"]), row
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("approx"),
    ).collect()[0]
    # 3x the configured rsd as the hard bound (rsd is a standard deviation,
    # not a max error).
    assert abs(row["approx"] - row["exact"]) <= 3 * 0.05 * row["exact"], row


def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("ap50"),
        F.percentile("value", F.lit(0.99)).alias("exact_p99"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10_000)).alias("ap99"),
    ).collect()[0]
    # accuracy=10000 → rank error ≤ n/10000; on the fixture value range
    # translate to a loose 2% relative envelope.
    for a, e in [(row["ap50"], row["exact_p50"]), (row["ap99"], row["exact_p99"])]:
        assert abs(a - e) <= 0.02 * max(abs(e), 1.0), row


def test_hll_group_distinct_matches_exact_ordering(spark, sf_dir):
    # Per-group sketches must preserve the coarse ordering of group sizes —
    # the property dashboards rely on when the exact count is unaffordable.
    ev = load(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.15 * r["exact"]), r
