#!/usr/bin/env python3
"""Alternating A/B: contamination_eval_train_overlap — r15's localCheckpoint
of the exploded gram stream (NEW) vs the r14 formulation that plans the
stream under both self-join sides (OLD). One session, alternating passes,
min over rounds, sentinel per pass. r15 verdict item 2: the driver artifacts
show 0.27x for this query and the round-16 opening bench shows 2.5x over the
r14 quiet number even at min-of-two — adjudicate and keep or revert.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    get_spark,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.core import (  # noqa: E402
    load,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.scale import (  # noqa: E402
    _md5_bucket,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (  # noqa: E402
    norm_tokens,
    shingles_from_tokens,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.util import (  # noqa: E402
    ensure_parallelism,
)


def build(spark, sf_dir, variant: str):
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    toked = docs.select(
        "doc_id",
        norm_tokens("text").alias("toks"),
        (_md5_bucket(F.col("doc_id")) >= "e6").alias("is_eval"),
    )
    grams = toked.select(
        "doc_id",
        "is_eval",
        F.explode(F.array_distinct(shingles_from_tokens(F.col("toks"), 5))).alias("g"),
    )
    if variant == "ckpt":
        grams = grams.localCheckpoint()
    ev = grams.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    tr = grams.filter(~F.col("is_eval")).select(F.col("doc_id").alias("train_id"), "g")
    return (
        ev.join(tr, "g")
        .groupBy("eval_doc_id")
        .agg(F.count_distinct("train_id").alias("n_train_docs"))
        .orderBy("eval_doc_id")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-contamination")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm both paths once (codegen/JIT outside the timed rounds)
    for v in ("old", "ckpt"):
        build(spark, sf_dir, v).count()

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    floor = min(sentinel() for _ in range(5))
    import gc

    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    times: dict[str, list[float]] = {"old": [], "ckpt": []}
    for r in range(rounds):
        for v in ("old", "ckpt") if r % 2 == 0 else ("ckpt", "old"):
            s = sentinel() / floor
            t0 = time.perf_counter()
            n = build(spark, sf_dir, v).count()
            dt = time.perf_counter() - t0
            gc.collect()
            times[v].append(dt)
            print(f"round {r} {v}: {dt:.3f}s rows={n} sentinel x{s:.2f}")
    for v, ts in times.items():
        print(f"{v}: min {min(ts):.3f}  all {[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
