"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in
``custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads``
(one registered pair per operator in SURVEY.md §2); this module is the thin
driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    workloads as workload,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return workload.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Curated order (workloads.PRIORITY): the correctness gate samples a prefix
    of this dict, so operators that lack a prior driver-verified row come
    first — see workloads/__init__.py for the rationale.
    """
    return workload.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query.

    Omitted only for the 10 non-SQL-expressible operators (engine-specific
    xxhash64-based signatures, approximate ANN/LSH, DCT/FFT perceptual
    hashes): for those the driver records row counts with ``rows_match:
    null`` (no oracle comparison); their verification lives in the pytest
    parity/recall pins (tests/test_operators.py, tests/test_dedup.py,
    tests/test_membership.py).

    ``{sf_dir}`` templating (round-9): oracles that must reference the
    parquet FILES themselves (parquet_metadata footer audits) rather than
    the pre-registered table views carry an ``{sf_dir}`` placeholder;
    it resolves here to the driver's fixed sf0.01 gate directory (the
    pytest parity harness substitutes its own sf_dir the same way).
    """
    return {
        n: sql.replace("{sf_dir}", "/root/testdata/sf0.01")
        for n, sql in workload.ordered_oracles().items()
    }
