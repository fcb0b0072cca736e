"""Physical-plan regression tests: the scale properties (pushdown, pruning,
broadcast, bounded shuffles) must hold, not just the row values."""

from __future__ import annotations

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
    workloads as w,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.inspect import (
    codegen_stage_count,
    has_broadcast_join,
    pushed_filters,
    read_columns,
    shuffle_count,
)


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    df = w.QUERIES["q01_pricing_summary"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f and "LessThanOrEqual" in f for f in pf), pf
    (cols,) = read_columns(df)
    # 7 of 16 lineitem columns — projection pruned into the scan.
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }


def test_q01_is_codegen_and_two_shuffles(spark, sf_dir):
    df = w.QUERIES["q01_pricing_summary"](spark, sf_dir)
    # one shuffle for the agg, one range-exchange for the sort — nothing else
    assert shuffle_count(df) == 2
    assert codegen_stage_count(df) >= 1


def test_join_queries_broadcast_dimensions(spark, sf_dir):
    for name in ["join_revenue_per_nation", "q3_shipping_priority", "q5_local_supplier_volume"]:
        df = w.QUERIES[name](spark, sf_dir)
        assert has_broadcast_join(df), f"{name} lost its broadcast join"


def test_filter_queries_push_predicates(spark, sf_dir):
    cases = {
        "filter_compare": "o_totalprice",
        "filter_between": "p_size",
        "filter_in": "n_name",
        "projection_alias": "c_acctbal",
    }
    for name, col in cases.items():
        pf = pushed_filters(w.QUERIES[name](spark, sf_dir))
        assert any(col in f for f in pf), f"{name}: expected pushdown on {col}, got {pf}"


def test_topk_uses_window_group_limit(spark, sf_dir):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.inspect import (
        plan_text,
    )

    df = w.QUERIES["window_topk_per_group"](spark, sf_dir)
    assert "WindowGroupLimit" in plan_text(df, "extended")


def test_asof_join_single_shuffle_per_side(spark, sf_dir):
    # union-tag as-of join: one hash shuffle for the window partition, one
    # range exchange max — no join explosion, no broadcast of the big side.
    df = w.QUERIES["asof_click_to_purchase"](spark, sf_dir)
    assert shuffle_count(df) <= 3


def test_scan_reads_only_projected_columns(spark, sf_dir):
    df = w.QUERIES["scan_full_table"](spark, sf_dir)
    (cols,) = read_columns(df)
    assert cols == {"r_regionkey", "r_name"}
