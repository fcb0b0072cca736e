#!/usr/bin/env python3
"""Alternating A/B: dedup_ngram_jaccard_top20 doc-freq cap — r15's window
count over partitionBy(s) (NEW) vs the r14 groupBy + left_semi join + second
localCheckpoint (OLD). r15 verdict item 2: the ~1.4x stage claim is
perf-weak (driver showed 0.76x); adjudicate under the alternating protocol.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (  # noqa: E402
    get_spark,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads.core import (  # noqa: E402
    load,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.text import (  # noqa: E402
    norm_tokens,
    shingles_from_tokens,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.util import (  # noqa: E402
    ensure_parallelism,
)


def build(spark, sf_dir, variant: str, n=3, max_doc_freq=256):
    docs = load(spark, sf_dir, "documents")
    toked = ensure_parallelism(docs).select(
        F.col("doc_id").alias("doc"), norm_tokens("text").alias("toks")
    )
    index = toked.select(
        "doc", F.explode(shingles_from_tokens(F.col("toks"), n)).alias("s")
    ).distinct()
    index = index.localCheckpoint()
    if variant == "window":
        index = (
            index.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    else:  # old: groupBy + semi-join + second checkpoint
        freq_ok = (
            index.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("s")
        )
        index = index.join(freq_ok, "s", "left_semi").localCheckpoint()
    sizes = index.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = index.select(F.col("doc").alias("id_a"), "s")
    b = index.select(F.col("doc").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    pairs = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    return (
        pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(20)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-jaccard-cap")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for v in ("old", "window"):
        build(spark, sf_dir, v).count()

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    floor = min(sentinel() for _ in range(5))
    import gc

    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    times: dict[str, list[float]] = {"old": [], "window": []}
    for r in range(rounds):
        for v in ("old", "window") if r % 2 == 0 else ("window", "old"):
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
