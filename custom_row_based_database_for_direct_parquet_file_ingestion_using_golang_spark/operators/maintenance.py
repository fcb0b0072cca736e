"""Table maintenance: CDC merge (upsert) and file-layout optimization.

The reference mutates storage row-at-a-time under a table lock
(``pkg/handlers/update.go``, ``delete.go`` — rewrite-all-rows per statement);
at 100 TB the equivalent is a batched CDC merge: one distributed anti-join
per batch, not one rewrite per row. Layout optimization (small-file
compaction + multi-dimensional clustering) is what keeps the scan side of
that story fast: parquet row-group min/max pruning only works when files
are clustered on the filter columns.

Scale design:
- ``merge_upsert`` is one key-shuffle (left-anti) + union. With a small
  changeset Spark's AQE turns the anti-join into a broadcast automatically;
  with a huge one it stays a shuffle join that AQE skew-splits.
- ``zorder_key`` normalizes each cluster column linearly to a fixed-width
  integer using ONE tiny global min/max aggregate (broadcast back), then
  bit-interleaves — no global sort, no percent_rank-style single-partition
  window, so it survives 100 TB. Linear scaling is coarser than
  rank-normalization for skewed columns but never bottlenecks.
- ``compact`` sizes output files from input bytes, range-partitions on the
  z-key, and sorts within partitions — the layout Delta/Iceberg OPTIMIZE
  ZORDER produces, via plain Spark writers.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """SCD1 merge: source rows replace key-matching target rows, unmatched
    source rows are inserted, and (if ``delete_col`` names a boolean column
    on ``source``) delete-flagged keys are removed entirely.

    ``source`` must be unique per key (the CDC contract: one net change per
    key per batch); duplicates would be inserted verbatim.
    """
    kept = target.join(source.select(*keys), keys, "left_anti")
    incoming = source
    if delete_col is not None:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return kept.unionByName(incoming)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append ``_zkey``: bit-interleaved (Morton) key over ``cols``.

    Each column is scaled linearly to ``[0, 2**bits)`` from its global
    min/max (one broadcast 1-row aggregate — no sort), then the per-column
    bits are interleaved MSB-first so nearby (c1, c2, ...) tuples get
    nearby keys. Nulls scale to 0. ``len(cols) * bits`` must fit a long.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError("len(cols) * bits must be <= 62 to fit a long key")
    # Each cluster column needs an order-preserving numeric form.
    # Numerics/booleans cast directly; timestamps → epoch micros; dates →
    # days since epoch. Strings (and other types) cast('double') to null,
    # which would silently collapse the dimension to bucket 0 — clustering
    # becomes a no-op with no signal — so they fail loudly instead
    # (dictionary-encode strings to a code column first).
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double", "boolean")
    dtypes = dict(df.dtypes)
    as_num: dict[str, Column] = {}
    for c in cols:
        dt = dtypes.get(c)
        if dt is None:
            raise ValueError(f"zorder_key: no such column {c!r}")
        if dt in numeric or dt.startswith("decimal"):
            as_num[c] = F.col(c).cast("double")
        elif dt in ("timestamp", "timestamp_ntz"):
            as_num[c] = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        elif dt == "date":
            as_num[c] = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        else:
            raise ValueError(
                f"zorder_key: column {c!r} has non-orderable-numeric type "
                f"{dt} — dictionary-encode it to a numeric code column "
                "before clustering"
            )
    aggs = []
    for c in cols:
        aggs += [
            F.min(as_num[c]).alias(f"_min_{c}"),
            F.max(as_num[c]).alias(f"_max_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = hi - lo
        frac = F.when(span > 0, (as_num[c] - lo) / span).otherwise(
            F.lit(0.0)
        )
        scaled.append(
            F.coalesce(F.floor(frac * top).cast("long"), F.lit(0)).alias(f"_s_{c}")
        )
    out = out.select(*df.columns, *scaled)
    key: Column = F.lit(0)
    for b in range(bits - 1, -1, -1):
        for c in cols:
            key = F.shiftleft(key, 1).bitwiseOR(
                F.shiftright(F.col(f"_s_{c}"), b).bitwiseAND(F.lit(1))
            )
    return out.select(*df.columns, key.alias("_zkey"))


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    zorder_cols: list[str] | None = None,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_bytes`` files,
    optionally z-order-clustered on ``zorder_cols``.

    Output file count is estimated from input bytes (local-FS stat here;
    on an object store, substitute the catalog's size metadata — the
    planning is identical). Returns {files_in, files_out, bytes_in}.
    """
    df = spark.read.parquet(in_path)
    files = df.inputFiles()
    bytes_in = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            bytes_in += os.stat(p).st_size
        except OSError:
            pass
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    if zorder_cols:
        out = cluster_by_zorder(df, zorder_cols, n_out)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    return {"files_in": len(files), "files_out": n_out, "bytes_in": bytes_in}


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_out: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Range-partition on the Morton key so each output file owns a
    contiguous z-range (global clustering), then sort inside so row groups
    within a file are clustered too — both levels feed min/max pruning.

    For a hive-partitioned table pass ``partition_cols``: the range
    partitioning then leads with them so each task owns a contiguous slice
    of ONE (mostly) disk partition. Without this, every task would span all
    disk partitions and a partitionBy writer would fan each task out into
    every directory — file count ~ tasks x partitions and per-file
    z-clustering destroyed.
    """
    pcols = list(partition_cols or [])
    # a column both partitioned and z-ordered leads as a partition column
    return (
        zorder_key(df, cols)
        .repartitionByRange(n_out, *pcols, "_zkey")
        .sortWithinPartitions(*pcols, "_zkey")
        .drop("_zkey")
    )
