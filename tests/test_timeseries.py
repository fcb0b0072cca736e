"""Unit tests for operators/timeseries.py: time_bucket alignment, dense
grid shape, and the three gapfill methods on hand-built frames with known
answers (edges: leading/trailing gaps, multi-key series, exact midpoints).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    timeseries as ts,
)


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_time_bucket_epoch_alignment(spark):
    df = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, 10, 7, 59, 999999)),
            Row(ts=dt.datetime(2024, 1, 1, 10, 10, 0, 0)),
            Row(ts=dt.datetime(1969, 12, 31, 23, 59, 59)),  # pre-epoch
        ]
    )
    out = [r[0] for r in df.select(ts.time_bucket("ts", 300)).collect()]
    assert out[0] == dt.datetime(2024, 1, 1, 10, 5)
    assert out[1] == dt.datetime(2024, 1, 1, 10, 10)  # boundary stays put
    # pmod floors toward -inf: pre-epoch buckets to 23:55, not 00:00
    assert out[2] == dt.datetime(1969, 12, 31, 23, 55)


def test_rollup_groups_by_bucket_and_keys(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=_t(10, 1), v=1.0),
            Row(k="a", ts=_t(10, 59), v=3.0),
            Row(k="b", ts=_t(10, 30), v=10.0),
        ]
    )
    out = {
        (r.k, r.slot): r.s
        for r in ts.rollup(
            df, "ts", 3600, ["k"], [F.sum("v").alias("s")]
        ).collect()
    }
    assert out == {("a", _t(10)): 4.0, ("b", _t(10)): 10.0}


def test_dense_grid_covers_global_span_per_key(spark):
    rolled = spark.createDataFrame(
        [
            Row(k="a", slot=_t(10), v=1.0),
            Row(k="b", slot=_t(13), v=2.0),  # b observed only at the end
        ]
    )
    grid = ts.dense_grid(rolled, "slot", ["k"], 3600)
    rows = {(r.k, r.slot) for r in grid.collect()}
    hours = [_t(10), _t(11), _t(12), _t(13)]
    assert rows == {(k, h) for k in ("a", "b") for h in hours}


def test_gapfill_null_marks_observed(spark):
    rolled = spark.createDataFrame(
        [Row(k="a", slot=_t(10), v=1.0), Row(k="a", slot=_t(12), v=2.0)]
    )
    out = {
        r.slot: (r.observed, r.v)
        for r in ts.gapfill(
            rolled, "slot", ["k"], ["v"], 3600, method="null"
        ).collect()
    }
    assert out == {
        _t(10): (True, 1.0),
        _t(11): (False, None),
        _t(12): (True, 2.0),
    }


def test_gapfill_locf_carries_forward_not_backward(spark):
    rolled = spark.createDataFrame(
        [
            Row(k="a", slot=_t(11), v=5.0),
            Row(k="a", slot=_t(14), v=7.0),
            # second key observed everywhere — must not leak into 'a'
            Row(k="b", slot=_t(10), v=100.0),
            Row(k="b", slot=_t(14), v=100.0),
        ]
    )
    out = {
        (r.k, r.slot): r.v
        for r in ts.gapfill(
            rolled, "slot", ["k"], ["v"], 3600, method="locf"
        ).collect()
    }
    assert out[("a", _t(10))] is None  # before first obs: no back-fill
    assert out[("a", _t(11))] == 5.0
    assert out[("a", _t(12))] == 5.0
    assert out[("a", _t(13))] == 5.0
    assert out[("a", _t(14))] == 7.0
    assert out[("b", _t(12))] == 100.0


def test_gapfill_linear_interpolates_on_time_axis(spark):
    # obs at 10:00 -> 0.0 and 14:00 -> 8.0; hourly slots interpolate 2/hour
    rolled = spark.createDataFrame(
        [Row(slot=_t(10), v=0.0), Row(slot=_t(14), v=8.0)]
    )
    out = {
        r.slot: r.v
        for r in ts.gapfill(
            rolled, "slot", [], ["v"], 3600, method="linear"
        ).collect()
    }
    assert out == {
        _t(10): 0.0,
        _t(11): 2.0,
        _t(12): 4.0,
        _t(13): 6.0,
        _t(14): 8.0,
    }


def test_gapfill_linear_no_extrapolation_with_keys(spark):
    # key 'a' observed only mid-span: slots outside [first, last] stay NULL
    rolled = spark.createDataFrame(
        [
            Row(k="a", slot=_t(11), v=1.0),
            Row(k="a", slot=_t(13), v=3.0),
            Row(k="b", slot=_t(10), v=0.0),
            Row(k="b", slot=_t(14), v=0.0),
        ]
    )
    out = {
        (r.k, r.slot): r.v
        for r in ts.gapfill(
            rolled, "slot", ["k"], ["v"], 3600, method="linear"
        ).collect()
    }
    assert out[("a", _t(10))] is None
    assert out[("a", _t(12))] == 2.0
    assert out[("a", _t(14))] is None
    assert out[("b", _t(12))] == 0.0


def test_gapfill_rejects_unknown_method(spark):
    rolled = spark.createDataFrame([Row(slot=_t(10), v=1.0)])
    import pytest

    with pytest.raises(ValueError, match="unknown gapfill method"):
        ts.gapfill(rolled, "slot", [], ["v"], 3600, method="spline")


def test_gapfill_plan_stays_jvm_side(spark):
    # No Python evaluation anywhere in the gapfill plan: generated grid,
    # join, and window must all be JVM operators (codegen-eligible).
    rolled = spark.createDataFrame(
        [Row(k="a", slot=_t(10), v=1.0), Row(k="a", slot=_t(12), v=2.0)]
    )
    plan = ts.gapfill(
        rolled, "slot", ["k"], ["v"], 3600, method="locf"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "Window" in plan


# --- interval merge (gaps-and-islands) --------------------------------------


def _iv_rows(spark, rows):
    return spark.createDataFrame(
        [(k, _t(*a), _t(*b)) for k, a, b in rows], ["k", "s", "e"]
    )


def test_merge_intervals_overlap_touch_and_gap(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.intervals import (
        merge_intervals,
    )

    df = _iv_rows(
        spark,
        [
            ("a", (10, 0), (11, 0)),
            ("a", (10, 30), (11, 30)),  # overlaps -> same island
            ("a", (11, 30), (12, 0)),   # touches -> same island
            ("a", (13, 0), (14, 0)),    # gap -> new island
            ("b", (10, 0), (10, 30)),   # other key never merges with a
        ],
    )
    out = {
        (r.k, r.island_start, r.island_end): r.n_intervals
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert out == {
        ("a", _t(10, 0), _t(12, 0)): 3,
        ("a", _t(13, 0), _t(14, 0)): 1,
        ("b", _t(10, 0), _t(10, 30)): 1,
    }


def test_merge_intervals_contained_interval(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.intervals import (
        merge_intervals,
    )

    # [10,14) contains [11,12): running-max (not lag) must keep the island
    # open past the short interval's end
    df = _iv_rows(
        spark,
        [
            ("a", (10, 0), (14, 0)),
            ("a", (11, 0), (12, 0)),
            ("a", (13, 0), (15, 0)),  # overlaps the LONG one, not the short
        ],
    )
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    assert out[0].island_start == _t(10, 0) and out[0].island_end == _t(15, 0)


def test_coverage_stats_counts_overlap_once(spark):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.intervals import (
        coverage_stats,
    )

    df = _iv_rows(
        spark,
        [
            ("a", (10, 0), (11, 0)),
            ("a", (10, 30), (11, 30)),  # island 1: 90 min total
            ("a", (20, 0), (20, 30)),   # island 2: 30 min
        ],
    )
    r = coverage_stats(df, ["k"], "s", "e").collect()[0]
    assert r.n_islands == 2
    assert r.coverage_sec == 90 * 60 + 30 * 60  # overlap counted once
    assert r.max_island_sec == 90 * 60
