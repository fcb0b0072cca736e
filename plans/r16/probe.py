#!/usr/bin/env python3
"""Isolated per-query probe for the r16 optimization round.

Usage: python plans/r15/probe.py <query> [query ...] [--passes N] [--explain]
Times each named workload query with the SAME methodology as bench.py
(full action via df.count(), min over passes, sentinel probe per pass) in
ONE session; optionally dumps .explain("formatted") to plans/r15/<q>_probe.txt.
Not part of the bench contract — a development tool only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    get_spark,
    workloads as workload,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    argv = list(sys.argv)  # r15 advice: don't mutate what we enumerate
    for i, a in enumerate(argv):
        if a == "--passes":
            if i + 1 >= len(argv):
                raise SystemExit("--passes needs a value")
            passes = int(argv[i + 1])
            args.remove(argv[i + 1])
    do_explain = "--explain" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sparkdb-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    floor = min(sentinel() for _ in range(5))
    print(f"# sentinel floor {floor:.3f}s", file=sys.stderr)
    import gc

    for name in args:
        fn = workload.QUERIES[name]
        if do_explain:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"{name}_probe.txt")
            with open(out, "w") as f:
                f.write(txt)
            print(f"# wrote {out}", file=sys.stderr)
        times = []
        for p in range(passes):
            s = sentinel() / floor
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            gc.collect()
            times.append(dt)
            print(f"{name} pass{p}: {dt:.3f}s rows={n} sentinel x{s:.2f}")
        print(f"{name} MIN: {min(times):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
