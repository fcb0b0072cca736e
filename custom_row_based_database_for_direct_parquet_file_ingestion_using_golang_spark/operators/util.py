"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_rows_per_partition: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default parallelism
    — but ONLY when the scan would otherwise under-parallelize.

    Why: Parquet scans split on row-group boundaries, so a small file written
    as a single row group yields ONE map task no matter what
    ``spark.sql.files.maxPartitionBytes`` says. For operators that do heavy
    per-row compute (MinHash signatures, SimHash bit sums, shingling,
    quality scoring), that serializes hundreds of ops/row onto one core.
    "Repartition before an expensive map" is the standard fix; the guard
    makes it a no-op at real scale, where a 100 TB table arrives with
    thousands of row groups and the extra shuffle would be the bug, not the
    fix.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
