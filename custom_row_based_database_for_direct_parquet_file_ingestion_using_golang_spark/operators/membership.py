"""Bloom-filter membership: build a compact bitset over a key set, probe it
shuffle-free as broadcast column algebra.

The 100 TB use case is asymmetric anti-joins where the filter side is
small-ish but the probed side is the whole corpus: decontaminating a
training corpus against an eval set's n-grams, suppressing a denylist of
URLs/fingerprints, pre-filtering a dedup candidate stage. A bloom filter
turns those from a shuffle join on billions of probe-side rows into a
scan-stage predicate: the probe never shuffles, never explodes the corpus,
and the filter itself is O(m/8) bytes broadcast once.

Everything here is engine-portable by construction: bit positions derive
from md5 hex substrings (``CAST(conv(substr(md5(x),1,15),16,10)``, which
DuckDB replays as ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), so an
ANSI oracle reproduces the EXACT bitset — including false positives — and
the whole pipeline is value-checkable, not just statistically plausible.

Scale posture:
  * build: one pass over the key side → k bit positions per key →
    distinct → driver collects ≤ popcount(bitset) ints (bounded by
    ``m_bits``, a tunable you size like any sketch). The collect is the
    deliberate design: the bitset IS the small side.
  * probe: the packed bitset ships as a plan-literal long array; the k bit
    tests are pure JVM column algebra inside WholeStageCodegen — zero
    shuffle, zero UDF, works in the scan stage before any join.
  * sizing: false-positive rate ≈ (1 - e^{-kn/m})^k; the defaults
    (m=2^17, k=5) hold ~1% at n≈10^4 keys. At larger key sets raise
    ``m_bits`` — memory is m/8 bytes (2^27 bits = 16 MiB broadcasts fine).

Reference scope note: the Go reference (CustomDB) has no membership or
dedup surface at all — this module is part of the beyond-reference
LLM-data-pipeline tier (SURVEY.md §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


def _hash60(key: Column, start: int) -> Column:
    """60-bit unsigned int from 15 md5 hex chars starting at ``start``
    (1-indexed). Engine-portable: DuckDB replays with a '0x' string cast."""
    return F.conv(F.substring(F.md5(key), start, 15), 16, 10).cast("long")


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the k bloom bit positions for ``key`` — double hashing
    (Kirsch–Mitzenmacher 2006): pos_i = (h1 + i·h2) mod m, with h1/h2 from
    disjoint md5 hex ranges. All arithmetic stays in nonnegative longs
    (< m·(k+1)), so Spark's pmod and ANSI ``%`` agree."""
    h1 = F.pmod(_hash60(key, 1), F.lit(m_bits))
    h2 = F.pmod(_hash60(key, 16), F.lit(m_bits))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


@dataclass(frozen=True)
class Bloom:
    """A built bloom filter: ``words[w]`` holds bits ``64w .. 64w+63``
    (bit b of the filter = bit ``b % 64`` of ``words[b // 64]``)."""

    m_bits: int
    k: int
    words: tuple[int, ...]

    @property
    def n_set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)

    def union(self, other: "Bloom") -> "Bloom":
        """OR-merge two filters built with the SAME (m_bits, k): the
        incremental-denylist operation — yesterday's bloom ∪ today's new
        keys without re-scanning history. A key probing True in either
        input probes True in the union (bloom filters are closed under
        bitwise OR)."""
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError(
                "bloom union requires identical (m_bits, k): "
                f"{(self.m_bits, self.k)} vs {(other.m_bits, other.k)}"
            )
        merged = []
        for a, b in zip(self.words, other.words):
            w = (a & 0xFFFFFFFFFFFFFFFF) | (b & 0xFFFFFFFFFFFFFFFF)
            merged.append(w - (1 << 64) if w >= (1 << 63) else w)
        return Bloom(m_bits=self.m_bits, k=self.k, words=tuple(merged))


def bloom_build(df: DataFrame, key_col: str | Column, m_bits: int = 1 << 17,
                k: int = 5) -> Bloom:
    """Build a bloom filter over the distinct keys of ``df``.

    One distributed pass: explode each key's k positions, distinct them
    (map-side partial agg — the shuffle carries at most ``m_bits`` rows no
    matter the key count), collect the set bits, pack driver-side into
    64-bit words. The driver transfer is bounded by m_bits ints by
    construction — this is a sketch collect (like IVF centroids), not an
    unbounded data collect."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    rows = (
        df.select(F.explode(bloom_positions(key, m_bits, k)).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r.pos // 64] |= 1 << (r.pos % 64)
    # Two's-complement into signed longs (Spark LongType literals).
    packed = tuple(w - (1 << 64) if w >= (1 << 63) else w for w in words)
    return Bloom(m_bits=m_bits, k=k, words=packed)


def bloom_contains(key: Column, bloom: Bloom) -> Column:
    """True iff every one of ``key``'s k bit positions is set — the packed
    words ship as ONE plan-literal array, probed with element_at + a bit
    test per position. Zero shuffle, zero UDF, codegen-friendly: usable as
    a scan-stage filter on a 100 TB probe side."""
    from .util import lit_long_array

    # one SQL-parsed literal, not m_bits/64 py4j lit() calls (round-16, §1.2)
    words = lit_long_array(bloom.words)
    h1 = F.pmod(_hash60(key, 1), F.lit(bloom.m_bits))
    h2 = F.pmod(_hash60(key, 16), F.lit(bloom.m_bits))
    checks = []
    for i in range(bloom.k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(bloom.m_bits))
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        # F.shiftleft's wrapper only takes a Python-int shift; call the SQL
        # function directly to shift by a Column.
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_gram_audit(
    probe: DataFrame,
    id_col: str,
    grams_col: str,
    bloom: Bloom,
) -> DataFrame:
    """Per-document bloom audit over an n-gram array column: for each probe
    row, how many of its distinct grams hit the filter. Returns
    ``(id_col, n_grams, n_hits, contaminated)``.

    The gram test runs INSIDE the array (``F.filter`` over the gram array —
    no explode, no shuffle): the corpus row count never multiplies, which
    is the entire point of probing a bloom instead of joining the gram
    sets."""
    grams = F.array_distinct(F.col(grams_col))
    hits = F.filter(grams, lambda g: bloom_contains(g, bloom))
    return probe.select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.size(hits).alias("n_hits"),
        (F.size(hits) > 0).alias("contaminated"),
    )
