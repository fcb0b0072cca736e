#!/usr/bin/env python3
"""Dump .explain('formatted') for named workload queries to plans/r16/.

Usage: python plans/r16/dump_plans.py <suffix> <query> [query ...]
Writes plans/r16/<query>_<suffix>.txt. Dev tool only.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    get_spark,
    workloads as workload,
)


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <suffix> <query> [query ...]")
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    here = os.path.dirname(os.path.abspath(__file__))
    for name in sys.argv[2:]:
        df = workload.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(here, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
