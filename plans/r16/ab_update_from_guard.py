#!/usr/bin/env python3
"""Alternating A/B: refsql_update_from determinism guard — r15's in-plan
key-aggregated guard (NEW, via ref_sql) vs the r14 formulation (OLD,
reconstructed from commit 2b774d6: a separate eager dup.count() job over the
source, then the update with a NON-aggregated source and a lit(True) hit
marker). Only the UPDATE statement is timed; the uo table is rebuilt before
every pass (identically for both variants, outside the timer).
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    Engine,
    get_spark,
)


def run_old(e: Engine) -> None:
    src = e.table("seg")
    src_rn = src.select(*[F.col(c).alias(f"__src_{c}") for c in src.columns])
    dup = (
        src_rn.groupBy(F.col("__src_c_custkey"))
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
    )
    if dup.count() > 0:  # the r14 eager guard job
        raise ValueError("duplicate source keys")
    src_sel = src_rn.select(
        "__src_c_custkey", "__src_tag", "__src_boost"
    ).withColumn("__upd_hit", F.lit(True))
    cond = (F.col("o_custkey") == F.col("__src_c_custkey")) & (
        F.col("o_totalprice") < 150000.0
    )
    frame = e.table("uo").join(src_sel, cond, "left")
    sets = {
        "o_orderstatus": F.col("__src_tag"),
        "o_totalprice": F.col("o_totalprice") + F.col("__src_boost"),
    }
    e.update("uo", sets, F.col("__upd_hit"), frame=frame)


def run_new(e: Engine) -> None:
    e.ref_sql(
        "UPDATE uo SET o_orderstatus = seg.tag, "
        "o_totalprice = o_totalprice + seg.boost FROM seg "
        "WHERE uo.o_custkey = seg.c_custkey AND uo.o_totalprice < 150000.0"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-updfrom")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    root = os.path.join(tempfile.gettempdir(), "sparkdb_ab_updf")
    shutil.rmtree(root, ignore_errors=True)
    e = Engine(spark, root)
    e.ingest_parquet(f"{sf_dir}/orders.parquet", "orders_raw")
    e.ingest_parquet(f"{sf_dir}/customer.parquet", "customer_raw")
    e.ref_sql(
        "CREATE TABLE seg AS SELECT c_custkey, "
        "substr(c_mktsegment, 1, 1) AS tag, c_acctbal * 0.1 AS boost "
        "FROM customer_raw WHERE c_custkey % 3 = 0"
    )

    def rebuild() -> None:
        try:
            e.ref_sql("DROP TABLE uo")
        except Exception:
            pass
        e.ref_sql(
            "CREATE TABLE uo AS SELECT o_orderkey, o_custkey, "
            "o_orderstatus, o_totalprice FROM orders_raw"
        )

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    # warm both paths
    for fn in (run_old, run_new):
        rebuild()
        fn(e)
    floor = min(sentinel() for _ in range(5))
    import gc

    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    times: dict[str, list[float]] = {"old": [], "new": []}
    order0 = [("old", run_old), ("new", run_new)]
    for r in range(rounds):
        for name, fn in order0 if r % 2 == 0 else order0[::-1]:
            rebuild()
            s = sentinel() / floor
            t0 = time.perf_counter()
            fn(e)
            dt = time.perf_counter() - t0
            gc.collect()
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s sentinel x{s:.2f}")
    for v, ts in times.items():
        print(f"{v}: min {min(ts):.3f}  all {[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
