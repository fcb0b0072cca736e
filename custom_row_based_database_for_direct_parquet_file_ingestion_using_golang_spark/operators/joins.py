"""Join operators Spark lacks natively: as-of join and range join.

The reference has no joins at all (single-table FROM only,
pkg/handlers/select.go:49-54); Spark's built-in equi/theta joins cover the
standard surface. These two are the classic time-series shapes a native
engine would special-case, implemented as compositions of built-in
DataFrame ops — no Python in the row path, so they keep whole-stage codegen
and scale with a single shuffle each.

As-of join — union-tag trick:
  Tag right rows 0, left rows 1; union; single shuffle/sort on
  (key, ts, tag); ``last(right_payload, ignorenulls=True)`` over a window
  partitioned by key ordered by (ts, tag) carries the most recent right row
  forward onto each left row. O(n log n) per key-partition, one shuffle,
  no broadcast, no skew-sensitive cross product. (Same plan shape Flink and
  QuestDB use for ASOF; at 100 TB this beats per-group merge_asof in pandas
  because state never leaves the JVM.)

Range join — bucketize + explode:
  A raw theta join ``l.ts BETWEEN r.ts - w AND r.ts`` is a cross product per
  key in Spark (BroadcastNestedLoop without an equi-key). Bucketizing time
  into width-``w`` buckets and exploding each left row into its two candidate
  buckets turns it into an equi-join on (key, bucket) + residual filter —
  shuffle-partitionable, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors).

    ``on`` may be one key column or a composite list (round-8) — e.g.
    (symbol, venue) quotes; the union-tag window simply partitions on
    all of them, so the plan stays one shuffle regardless of key arity.
    ``tolerance`` (an INTERVAL string like '3 days') bounds the lookback:
    matches older than ``left_ts - tolerance`` become NULL.
    Right rows must be unique per (on, right_ts); pre-aggregate if not.
    Payload columns must not collide with left column names.

    The matched right row travels as ONE struct through the window, so its
    payload values stay atomic — per-column carry would stitch values from
    DIFFERENT right rows whenever a payload value is legitimately NULL.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(f"payload columns collide with left columns: {sorted(collisions)}")

    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    payload = list(right_payload)
    other_lcols = [c for c in lcols if c not in (*keys, left_ts)]

    match_type = T.StructType(
        [T.StructField("matched_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
    )

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(right_ts).alias("matched_ts"), *[F.col(c) for c in payload]
        ).alias("__match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in other_lcols],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(match_type).alias("__match"),
        *[F.col(c) for c in other_lcols],
    )

    unioned = r.unionByName(l)
    order = (
        [F.col("__ts").asc(), F.col("__tag").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__tag").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = unioned.select(
        *keys,
        "__ts",
        "__tag",
        F.last("__match", ignorenulls=True).over(w).alias("__match"),
        *[F.col(c) for c in other_lcols],
    ).filter(F.col("__tag") == 1)

    match = F.col("__match")
    if tolerance is not None:
        bound = (
            F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        )
        in_range = (
            (match["matched_ts"] >= bound)
            if direction == "backward"
            else (match["matched_ts"] <= bound)
        )
        match = F.when(in_range, match).otherwise(F.lit(None).cast(match_type))

    return carried.select(
        *[
            F.col("__ts").alias(left_ts) if c == left_ts else F.col(c)
            for c in lcols
        ],
        match["matched_ts"].alias(f"asof_{right_ts}"),
        *[match[c].alias(c) for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    strict_after: bool = True,
) -> DataFrame:
    """Pairs (l, r) with the same key where ``r.ts`` falls in
    ``(l.ts, l.ts + window_seconds]`` (strict_after) or
    ``[l.ts, l.ts + window_seconds]``.

    Implemented as an equi-join on (key, time-bucket) after exploding each
    left row into its two candidate buckets — see module docstring.
    Column name collisions are resolved by prefixing right columns ``r_``.
    """
    w = int(window_seconds)
    lb = (F.unix_timestamp(F.col(left_ts)) / w).cast("long")
    rb = (F.unix_timestamp(F.col(right_ts)) / w).cast("long")

    l = left.withColumn("__bucket", F.explode(F.array(lb, lb + 1)))
    r = right.select(
        F.col(on).alias(f"__r_{on}"),
        rb.alias("__bucket"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    lower_ok = (
        F.col(f"r_{right_ts}") > F.col(left_ts)
        if strict_after
        else F.col(f"r_{right_ts}") >= F.col(left_ts)
    )
    upper_ok = F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(
        f"INTERVAL {w} seconds"
    )
    return (
        l.join(r, (l[on] == r[f"__r_{on}"]) & (l["__bucket"] == r["__bucket"]))
        .filter(lower_ok & upper_ok)
        .drop("__bucket", f"__r_{on}")
    )
