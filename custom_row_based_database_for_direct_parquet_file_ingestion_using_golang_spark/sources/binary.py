"""Binary-file sources: the IMAGE column's byte-materialization path.

The reference stores IMAGE columns as resolved filesystem paths
(pkg/handlers/insert.go:168-226) and never loads the bytes. The Spark-native
extension loads them on demand with the built-in ``binaryFile`` source —
distributed, predicate-prunable on path/size/modificationTime — and lifts
the result into the canonical media schema (operators/multimodal.py) for
feature extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

IMAGE_GLOB = "*.{jpg,jpeg,png,gif,bmp,tiff,webp}"


def load_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read files as (path, modificationTime, length, content) rows."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def load_images(spark: SparkSession, path: str) -> DataFrame:
    """Image-extension-filtered binary read, as the canonical media schema."""
    files = load_binary_files(spark, path, IMAGE_GLOB)
    return files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("path").alias("uri"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("image/unknown").alias("content_type"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_image_bytes(
    df: DataFrame, spark: SparkSession, path_col: str
) -> DataFrame:
    """Join a path-typed IMAGE column (the reference's representation) with
    the actual bytes: distinct paths → one binaryFile read per path root is
    avoided by reading the parent dirs once and joining on path."""
    paths = [r[0] for r in df.select(path_col).distinct().collect()]
    if not paths:
        return df.withColumn("payload", F.lit(None).cast("binary"))
    import os

    parents = sorted({os.path.dirname(p) or "." for p in paths})
    files = None
    for parent in parents:
        part = load_binary_files(spark, parent)
        files = part if files is None else files.unionByName(part)
    files = files.select(
        F.col("path").alias("__binpath"), F.col("content").alias("payload")
    )
    # binaryFile paths are URIs (file:/...); normalize both sides.
    norm = F.regexp_replace(F.col("__binpath"), "^file:", "")
    return df.join(
        files.withColumn("__binpath", norm),
        df[path_col] == F.col("__binpath"),
        "left",
    ).drop("__binpath")
