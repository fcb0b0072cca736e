"""Seeded fuzz: the compat expression helpers must match their Python
reference models over randomized inputs (one Spark batch per test — the
whole corpus evaluates in a single plan)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.functions.compat import (
    dual_compare,
    ref_like,
)

rng = random.Random(1234)

ALPHABET = string.ascii_lowercase[:6] + "19. -"


def _rand_str() -> str:
    return "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 8)))


def _py_ref_like(value: str, pattern: str) -> bool:
    if pattern.startswith("%") and pattern.endswith("%") and len(pattern) >= 2:
        return pattern[1:-1] in value
    if pattern.startswith("%"):
        return value.endswith(pattern[1:])
    if pattern.endswith("%"):
        return value.startswith(pattern[:-1])
    return value == pattern


def _py_float(s: str):
    try:
        return float(s)
    except ValueError:
        return None


def _py_dual(left: str, op: str, right: str) -> bool:
    ln, rn = _py_float(left), _py_float(right)
    if ln is not None and rn is not None:
        a, b = ln, rn
    else:
        a, b = left, right
    return {
        "=": a == b,
        "!=": a != b,
        "<": a < b,
        "<=": a <= b,
        ">": a > b,
        ">=": a >= b,
    }[op]


def test_ref_like_fuzz(spark):
    values = [_rand_str() for _ in range(300)]
    cores = [_rand_str()[:4] for _ in range(20)]
    patterns = (
        [f"%{c}%" for c in cores]
        + [f"%{c}" for c in cores]
        + [f"{c}%" for c in cores]
        + cores
    )
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    checks = df.select(
        "v", *[ref_like("v", p).alias(f"p{i}") for i, p in enumerate(patterns)]
    ).collect()
    for row in checks:
        for i, p in enumerate(patterns):
            assert row[f"p{i}"] == _py_ref_like(row.v, p), (row.v, p)


def test_dual_compare_fuzz(spark):
    pairs = [(_rand_str(), _rand_str()) for _ in range(200)]
    pairs += [(str(rng.randint(-50, 50)), str(rng.randint(-50, 50))) for _ in range(100)]
    pairs += [(str(rng.uniform(-5, 5))[:6], str(rng.randint(0, 9))) for _ in range(100)]
    ops = ["=", "!=", "<", "<=", ">", ">="]
    df = spark.createDataFrame(pairs, ["l", "r"])
    checks = df.select(
        "l",
        "r",
        *[dual_compare(F.col("l"), op, F.col("r")).alias(f"o{i}") for i, op in enumerate(ops)],
    ).collect()
    mismatches = []
    for row in checks:
        for i, op in enumerate(ops):
            want = _py_dual(row.l, op, row.r)
            if bool(row[f"o{i}"]) != want:
                mismatches.append((row.l, op, row.r, row[f"o{i}"], want))
    assert not mismatches, mismatches[:5]


def test_filtered_agg_and_string_agg_match_duckdb_fuzz(spark, tmp_path):
    """Round-8 differential fuzz: random grouped queries using the new
    FILTER (WHERE ...) and STRING_AGG verbs, run through the DIALECT and
    through DuckDB over the byte-identical parquet — results must match
    cell-for-cell across randomized predicates and seeds."""
    import duckdb

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
        Engine,
    )

    frng = random.Random(4242)
    rows = [
        (frng.choice(["a", "b", "c", "d"]), frng.randint(0, 60))
        for _ in range(400)
    ]
    pq = str(tmp_path / "fz.parquet")
    spark.createDataFrame(rows, ["g", "v"]).coalesce(1).write.parquet(pq)
    e = Engine(spark, str(tmp_path / "fzdb"))
    e.ingest_parquet(pq, "t")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")

    for trial in range(6):
        p1 = f"v > {frng.randint(0, 55)}"
        p2 = f"v % {frng.randint(2, 5)} = {frng.randint(0, 1)}"
        sql = (
            "SELECT g, COUNT(*) AS n, "
            f"COUNT(*) FILTER (WHERE {p1}) AS n1, "
            f"SUM(v) FILTER (WHERE {p2}) AS s2, "
            "STRING_AGG(v, ',' ORDER BY v) AS vs "
            "FROM t GROUP BY g ORDER BY g"
        )
        got = [
            (r.g, r.n, r.n1, r.s2, r.vs) for r in e.ref_sql(sql).collect()
        ]
        # DuckDB's string_agg takes the in-call ORDER BY natively — the
        # exact portable form the dialect accepts.
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == want, f"trial {trial}: {sql}"
