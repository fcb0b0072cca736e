"""Plan inspection helpers: assert the physical properties that matter at
100 TB — filter pushdown into the Parquet scan, column pruning, broadcast
joins for small dimensions, whole-stage codegen coverage.

The reference has no planner to inspect (token stream → direct
interpretation, SURVEY.md §3); here the optimizer IS Catalyst, so these
helpers are how tests pin down that the plans we ship are the plans we
designed.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for line in plan_text(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                out.extend(p.strip() for p in inner.split(","))
    return out


def read_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (ReadSchema)."""
    sets: list[set[str]] = []
    for line in plan_text(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rstrip(">")
            cols = {f.split(":")[0].strip() for f in schema.split(",") if ":" in f}
            sets.append(cols)
    return sets


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df, "simple")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (before AQE
    runtime coalescing — an upper bound on materialized shuffles)."""
    return plan_text(df, "simple").count("Exchange hashpartitioning") + plan_text(
        df, "simple"
    ).count("Exchange rangepartitioning")


def codegen_stage_count(df: DataFrame) -> int:
    return plan_text(df, "codegen").count("WholeStageCodegen subtree")
