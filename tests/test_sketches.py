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


# ---------------------------------------------------------------------------
# Engine-portable sketches (operators/sketch.py) — round 8.
# These DO have driver entries (sketch_hll_distinct / sketch_kmv_distinct /
# sketch_cms_heavy_hitters): the md5-derived hashing replays in ANSI SQL, so
# the oracle hash-checks the registers themselves. The tests below pin the
# algebraic properties the oracle can't see: mergeability, error envelopes,
# the CMS never-undercount guarantee, and parameter validation.
# ---------------------------------------------------------------------------

import pytest

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    sketch as sk,
)


def test_hll_estimate_within_envelope(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    est = sk.hll_distinct(
        li, F.col("l_orderkey").cast("string"), p=10
    ).collect()[0]["hll_est"]
    # Standard error for m=1024 is 1.04/sqrt(1024) ≈ 3.25%; allow 4 sigma.
    assert abs(est - exact) <= max(5.0, 4 * 0.0325 * exact), (est, exact)


def test_hll_merge_equals_sketch_of_union(spark, sf_dir):
    # The mergeability contract: MAX-merging two register tables is
    # bit-identical to sketching the concatenated input — the property that
    # makes per-day rollups at 100 TB sound.
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 != 0)
    key = F.col("l_orderkey").cast("string")
    merged = sk.hll_merge(
        sk.hll_registers(a, key, p=9), sk.hll_registers(b, key, p=9)
    )
    whole = sk.hll_registers(li, key, p=9)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_registers_bounded_by_m(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    regs = sk.hll_registers(li, F.col("l_orderkey").cast("string"), p=7)
    assert regs.count() <= 128  # m = 2^7 regardless of input cardinality
    bad = regs.filter((F.col("rho") < 1) | (F.col("rho") > 54)).count()
    assert bad == 0  # rho range: [1, 60-p+1]


def test_kmv_exact_branch_and_estimator_branch(spark):
    # < k distinct values → the sketch IS the distinct set (exact branch).
    small = spark.range(10).select(F.col("id").cast("string").alias("k"))
    row = sk.kmv_estimate(sk.kmv_sketch(small, "k", k=256), 256).collect()[0]
    assert row["n_in_sketch"] == 10 and row["kmv_est"] == 10.0
    # >= k distinct → estimator branch, ~1/sqrt(k-1) ≈ 6.3% sigma; 4 sigma.
    big = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    row = sk.kmv_estimate(sk.kmv_sketch(big, "k", k=256), 256).collect()[0]
    assert row["n_in_sketch"] == 256
    assert abs(row["kmv_est"] - 20_000) <= 4 * 0.063 * 20_000, row


def test_kmv_merge_equals_sketch_of_union(spark):
    df = spark.range(5_000).select(F.col("id").cast("string").alias("k"))
    a = spark.range(0, 5_000, 2).select(F.col("id").cast("string").alias("k"))
    b = spark.range(1, 5_000, 2).select(F.col("id").cast("string").alias("k"))
    merged = sk.kmv_merge(sk.kmv_sketch(a, "k", 64), sk.kmv_sketch(b, "k", 64), 64)
    whole = sk.kmv_sketch(df, "k", 64)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in whole.collect()
    )


def test_cms_never_undercounts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (
        norm_tokens,
    )

    toks = docs.select(F.explode(norm_tokens("text")).alias("tok"))
    cms = sk.cms_build(toks, "tok", width=512, depth=3)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probed = sk.cms_point_estimates(cms, exact, "tok", 512, 3)
    under = probed.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert under == 0  # the CMS guarantee: estimates are always >= truth
    # grid bounded by construction
    assert cms.count() <= 3 * 512


def test_cms_merge_is_addition(spark):
    a = spark.range(1_000).select((F.col("id") % 50).cast("string").alias("k"))
    b = spark.range(500).select((F.col("id") % 20).cast("string").alias("k"))
    ga = sk.cms_build(a, "k", width=128, depth=2)
    gb = sk.cms_build(b, "k", width=128, depth=2)
    merged = (
        ga.unionByName(gb).groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_build(a.unionByName(b), "k", width=128, depth=2)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sketch_parameter_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        sk.hll_registers(df, "k", p=6)
    with pytest.raises(ValueError):
        sk.hll_registers(df, "k", p=21)
    with pytest.raises(ValueError):
        sk.kmv_sketch(df, "k", k=1)
    with pytest.raises(ValueError):
        sk.cms_build(df, "k", width=1, depth=3)
    with pytest.raises(ValueError):
        sk.cms_build(df, "k", width=16, depth=0)


def test_hll_set_algebra_envelope(spark, sf_dir):
    # The composed inclusion-exclusion intersection carries ~3x a single
    # sketch's error; pin a loose absolute+relative envelope vs exact.
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.sketches import (
        sketch_hll_set_algebra,
    )

    row = sketch_hll_set_algebra(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact_union = a.union(b).distinct().count()
    assert row["exact_intersect"] == a.intersect(b).count()
    assert abs(row["est_union"] - exact_union) <= max(
        10.0, 4 * 0.0325 * exact_union
    ), row
    assert abs(row["est_intersect"] - row["exact_intersect"]) <= max(
        15.0, 12 * 0.0325 * exact_union
    ), row


def test_kmv_set_estimates_envelope_and_identity(spark):
    # Identity: A vs A gives jaccard 1.0 and est_intersect == est_union.
    a = spark.range(5_000).select(F.col("id").cast("string").alias("k"))
    sa = sk.kmv_sketch(a, "k", 128)
    row = sk.kmv_set_estimates(sa, sa, 128).collect()[0]
    assert row["jaccard"] == 1.0
    assert row["est_intersect"] == row["est_union"]
    # Known half-overlap: A = [0, 10k), B = [5k, 15k) — J = 1/3.
    b = spark.range(5_000, 15_000).select(F.col("id").cast("string").alias("k"))
    a2 = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    row = sk.kmv_set_estimates(
        sk.kmv_sketch(a2, "k", 256), sk.kmv_sketch(b, "k", 256), 256
    ).collect()[0]
    # Jaccard sigma ≈ sqrt(J(1-J)/k) ≈ 0.03; allow 4 sigma.
    assert abs(row["jaccard"] - 1 / 3) <= 0.12, row
    assert abs(row["est_union"] - 15_000) <= 4 * 0.063 * 15_000, row
    assert abs(row["est_intersect"] - 5_000) <= 0.35 * 5_000, row


def test_hist_quantiles_error_bound_and_merge(spark, sf_dir):
    # The histogram quantile's value error is bounded by ONE BIN WIDTH —
    # the deterministic contract GK/KLL trade away. Also: histograms merge
    # by addition (split-sketch == whole-sketch).
    orders = load(spark, sf_dir, "orders")
    lo, hi, bins = 0.0, 500_000.0, 1000
    width = (hi - lo) / bins
    hist = sk.hist_build(orders, "o_totalprice", lo, hi, bins)
    est = {
        r["q"]: r["est_q"]
        for r in sk.hist_quantiles(hist, [0.5, 0.9, 0.99], lo, hi, bins).collect()
    }
    exact = orders.agg(
        F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    ).collect()[0][0]
    for q, ex in zip([0.5, 0.9, 0.99], exact):
        assert abs(est[q] - ex) <= width, (q, est[q], ex)
    # merge = addition
    a = sk.hist_build(
        orders.filter(F.col("o_orderkey") % 2 == 0), "o_totalprice", lo, hi, bins
    )
    b = sk.hist_build(
        orders.filter(F.col("o_orderkey") % 2 != 0), "o_totalprice", lo, hi, bins
    )
    merged = a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    assert merged.exceptAll(hist).count() == 0
    assert hist.exceptAll(merged).count() == 0
    with pytest.raises(ValueError):
        sk.hist_build(orders, "o_totalprice", 10.0, 10.0, 8)
    with pytest.raises(ValueError):
        sk.hist_quantiles(hist, [0.0], lo, hi, bins)


def test_grouped_hist_quantiles_error_bound(spark, sf_dir):
    # Per-group estimates must stay within one bin width of each group's
    # exact quantile (the exact column is pytest-only: percentile
    # interpolation sits on half-cent knife edges across engines).
    li = load(spark, sf_dir, "lineitem")
    lo, hi, bins = 0.0, 110_000.0, 1100
    width = (hi - lo) / bins
    hist = sk.hist_build(
        li, "l_extendedprice", lo, hi, bins, group_cols=["l_returnflag"]
    )
    est = {
        (r["l_returnflag"], r["q"]): r["est_q"]
        for r in sk.hist_quantiles(
            hist, [0.5, 0.95], lo, hi, bins, group_cols=["l_returnflag"]
        ).collect()
    }
    exact = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))).alias("ex")
    ).collect()
    assert len(est) == 2 * len(exact)
    for row in exact:
        for q, ex in zip([0.5, 0.95], row["ex"]):
            e = est[(row["l_returnflag"], q)]
            assert abs(e - ex) <= width, (row["l_returnflag"], q, e, ex)
