"""Oracle parity harness: every registered workload query must match its
DuckDB oracle (row count + sorted-column value multiset) — the same check the
driver runs, so a green run here predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
    workloads as workload,
)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(workload.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = workload.QUERIES[name](spark, sf_dir)
    # Final outputs are never DECIMAL-typed (registry.py convention): the
    # driver's value hash canonicalizes DECIMAL differently on its two
    # sides, so value-identical rows still hash-mismatch (round-6's only
    # red rows). This sweep catches the class for every oracle entry.
    from pyspark.sql.types import DecimalType

    decimal_cols = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decimal_cols, (
        f"{name}: DECIMAL-typed output columns {decimal_cols} — cast the "
        "final projection to DOUBLE on both Spark and oracle sides"
    )
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle_sql = workload.ORACLES[name].replace("{sf_dir}", sf_dir)
    # Round-10 (the round-9 red): the ORACLE side must be decimal-free
    # too. DuckDB types SUM(BIGINT) as HUGEINT, which fetchall() renders
    # as a plain int (so this harness used to stay green) but which
    # exports to Arrow as decimal128(38,0) — diverging the DRIVER's value
    # hash on cell-identical rows. DESCRIBE exposes the declared types
    # without executing; HUGEINT and DECIMAL are exactly the types that
    # export as decimal128.
    duck_types = duck.execute("DESCRIBE " + oracle_sql).fetchall()
    bad = [
        (c, t)
        for c, t, *_ in duck_types
        if "DECIMAL" in t.upper() or "HUGEINT" in t.upper()
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} are DECIMAL/HUGEINT-typed — "
        "they export to Arrow as decimal128 and diverge the driver's value "
        "hash; CAST to BIGINT/DOUBLE on both sides"
    )

    res = duck.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sc, dc = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_every_oracle_has_query():
    assert set(workload.ORACLES) <= set(workload.QUERIES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_query_not_vacuous(name, spark, sf_dir, duck):
    """An oracle entry that returns zero rows on the fixtures verifies
    nothing (empty == empty passes for ANY bug that yields empty). Every
    entry must produce rows at the test scale."""
    n = duck.execute(
        "SELECT count(*) FROM ("
        + workload.ORACLES[name].replace("{sf_dir}", sf_dir)
        + ")"
    ).fetchone()[0]
    assert n > 0, f"{name}: oracle returns 0 rows at this scale — vacuous check"


def test_registry_matches_survey_totals():
    """SURVEY.md §8's totals drifted from the registry twice; pin them.
    Parses the 'Totals: N workload queries (M DuckDB-oracle-checked' line
    so adding a workload without updating the doc (or vice versa) fails."""
    import re
    from pathlib import Path

    survey = Path(__file__).resolve().parent.parent / "SURVEY.md"
    m = re.search(
        r"Totals: (\d+) workload queries \((\d+) DuckDB-oracle-checked",
        survey.read_text(),
    )
    assert m, "SURVEY.md totals line not found / format changed"
    documented_q, documented_o = int(m.group(1)), int(m.group(2))
    assert len(workload.QUERIES) == documented_q, (
        f"registry has {len(workload.QUERIES)} queries, SURVEY.md documents "
        f"{documented_q} — update SURVEY.md §8"
    )
    assert len(workload.ORACLES) == documented_o, (
        f"registry has {len(workload.ORACLES)} oracles, SURVEY.md documents "
        f"{documented_o} — update SURVEY.md §8"
    )
    # Round-8 (ADVICE): the headline-set count drifted 40→43 unguarded —
    # pin it against bench.BENCH_QUERIES too.
    mb = re.search(r"headline set of (\d+) queries", survey.read_text())
    assert mb, "SURVEY.md 'headline set of N queries' line not found"
    import bench

    assert len(bench.BENCH_QUERIES) == int(mb.group(1)), (
        f"bench.py has {len(bench.BENCH_QUERIES)} headline queries, "
        f"SURVEY.md documents {mb.group(1)} — update SURVEY.md §8"
    )


def test_priority_window_names_registered():
    """Every PRIORITY rotation name must exist in the registry — a rename
    must not silently drop an entry from the driver's gate window."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        PRIORITY,
        ordered_queries,
    )

    assert set(PRIORITY) <= set(workload.QUERIES)
    ordered = ordered_queries()
    assert list(ordered)[: len(PRIORITY)] == PRIORITY
    assert set(ordered) == set(workload.QUERIES)


def test_priority_covers_entire_registry():
    """set(PRIORITY) == set(QUERIES), both directions (round-10 verdict #1).

    The r10 rotation commit dropped a 49-entry r7-evidence block from
    PRIORITY entirely — those workloads became unreachable by the driver's
    50-slot gate window forever, because only PRIORITY order is sampled.
    The subset check above cannot catch an *omission*; this equality pins
    every registered workload into the rotation so a hand-curated edit can
    never silently retire an entry again. A duplicate-name check rides
    along: a duplicate would shift the window boundary off by one.
    """
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.workloads import (
        PRIORITY,
    )

    assert len(PRIORITY) == len(set(PRIORITY)), sorted(
        n for n in set(PRIORITY) if PRIORITY.count(n) > 1
    )
    missing_from_priority = set(workload.QUERIES) - set(PRIORITY)
    assert not missing_from_priority, (
        f"{len(missing_from_priority)} registered workloads are absent from "
        f"PRIORITY and can never be driver-checked: "
        f"{sorted(missing_from_priority)}"
    )
    assert set(PRIORITY) == set(workload.QUERIES)
