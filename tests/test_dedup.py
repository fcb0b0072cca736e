"""Dedup internals: parity pins for the Arrow-vectorized rewrites.

The numpy UDF paths (_simhash_pack_udf, _perm_mins_udf) replaced interpreted
higher-order Column formulations for speed; these tests pin the rewrites
bit-identical to the independent reference formulations so a future numpy
change can't silently alter signatures.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    dedup,
)

_WORDS = [
    "alpha", "beta", "gamma", "delta", "spark", "parquet", "engine",
    "quick", "brown", "fox", "lazy", "dog", "data", "pipeline", "token",
]


def _random_docs(seed: int = 7, n: int = 60) -> list[tuple[int, str | None]]:
    rng = random.Random(seed)
    rows: list[tuple[int, str | None]] = [
        (0, None),        # null text → null token hashes → simhash 0
        (1, ""),          # empty text → empty token array → simhash 0
        (2, "   "),       # whitespace-only normalizes to empty
        (3, "!!! ???"),   # punctuation-only normalizes to empty
        (4, "solo"),      # single token
    ]
    for i in range(5, n):
        rows.append(
            (i, " ".join(rng.choices(_WORDS, k=rng.randrange(1, 40))))
        )
    return rows


def test_simhash_udf_matches_column_reference(spark):
    docs = spark.createDataFrame(_random_docs(), ["doc_id", "text"])
    hashed = dedup._simhash_tokens(docs, "doc_id", "text")
    both = hashed.select(
        "doc",
        dedup._simhash_pack_udf()(F.col("hs")).alias("udf"),
        dedup._simhash_packed_column_reference().alias("ref"),
    ).collect()
    assert len(both) == 60
    mismatches = [(r.doc, r.udf, r.ref) for r in both if r.udf != r.ref]
    assert not mismatches, mismatches[:5]


def test_perm_mins_udf_vectorized_path_handles_mixed_batches(spark):
    # A batch mixing null, empty, and real shingle-hash arrays must NOT
    # degrade to the per-row path for the real rows (the masked reduceat
    # path covers them) and must produce exact per-permutation minima.
    params = dedup._perm_params(8)
    rows = [
        (0, None),
        (1, []),
        (2, [5]),
        (3, [17, 3, 99, 3]),
        (4, list(range(1000, 1300, 7))),
    ]
    df = spark.createDataFrame(rows, ["doc", "bh"])
    got = {
        r.doc: r.sig
        for r in df.select(
            "doc", dedup._perm_mins_udf(params)(F.col("bh")).alias("sig")
        ).collect()
    }
    assert got[0] is None
    assert got[1] == [None] * 8
    for doc, bh in rows[2:]:
        expect = [min((a * x + b) % dedup._MERSENNE_31 for x in bh) for a, b in params]
        assert got[doc] == expect, doc
