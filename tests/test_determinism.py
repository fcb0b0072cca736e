"""Every oracle-paired workload query must be run-to-run deterministic —
the driver value-hashes results, so any nondeterminism (unstable top-k ties,
partition-order-dependent floats surfacing through rounding) fails the gate
even when both runs are 'correct'."""

from __future__ import annotations

import math

import pytest

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
    workloads as w,
)


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def _canon(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in df.collect())


@pytest.mark.parametrize("name", sorted(w.ORACLES))
def test_query_is_deterministic(name, spark, sf_dir):
    a = _canon(w.QUERIES[name](spark, sf_dir))
    b = _canon(w.QUERIES[name](spark, sf_dir))
    assert a == b, f"{name}: two runs differ"
