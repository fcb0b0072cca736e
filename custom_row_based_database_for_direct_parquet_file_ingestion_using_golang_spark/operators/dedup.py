"""Deduplication operators for training-data pipelines.

Four tiers, from exact to fuzzy, all expressed as DataFrame plans that
shuffle on content-derived keys (never collect to the driver):

  exact_dedup          hash-groupBy on content key; keep min-id row
  jaccard_pairs        exact n-gram-shingle Jaccard via shingle-inverted-
                       index self-join (the quadratic term only hits docs
                       sharing a shingle; optional document-frequency cap
                       drops stop-shingles that would create hot keys)
  minhash_lsh_pairs    MinHash signatures + banded LSH bucketing → candidate
                       pairs → exact-Jaccard verification (the 100 TB path:
                       cost is O(docs × num_perm) + bucket-local joins)
  simhash_pairs        64-bit SimHash + pigeonhole chunk blocking →
                       Hamming-distance filter via xor/bit_count

MinHash/SimHash internals use Spark's xxhash64 — engine-specific hashes, so
those two register rows-only correctness checks; the exact tiers have full
SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalize_text, shingle_multiset, shingles, tokenize


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row per key group: the one with the smallest id.

    groupBy + NULL-SAFE semi-join: the groupBy combines map-side (partial
    min), and AQE's skew-join can split a hot duplicate key's probe
    partition — a window row_number would funnel every copy of a hot key
    into one sort task, and a null-unsafe semi-join would drop NULL-keyed
    rows instead of keeping one.
    """
    import functools
    import operator

    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias("__keep_id"))
    cond = functools.reduce(
        operator.and_, [df[k].eqNullSafe(keep[k]) for k in key_cols]
    ) & (df[id_col] == keep["__keep_id"])
    return df.join(keep, cond, "left_semi")


def duplicate_groups(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Per duplicate group: keeper id, copy count (groups of 1 excluded)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("copies"))
        .filter(F.col("copies") > 1)
    )


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int, max_doc_freq: int | None
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, shingle) inverted index (set semantics) + per-doc set sizes.

    Dedup happens at row level (.distinct() after explode) rather than via
    array_distinct inside the expression — distributed, and ~4× cheaper on
    wide documents."""
    index = df.select(
        F.col(id_col).alias("doc"), F.explode(shingle_multiset(text_col, n)).alias("s")
    ).distinct()
    if max_doc_freq is not None:
        # Drop stop-shingles: a shingle appearing in k docs contributes k²
        # candidate pairs — the classic skew bomb at corpus scale.
        rare = (
            index.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("s")
        )
        index = index.join(rare, "s", "left_semi")
    # Sizes AFTER the frequency cap: jaccard is then consistent over the
    # capped shingle universe (sizes from the uncapped index would bias
    # every capped jaccard toward zero and drop genuine near-dups).
    sizes = index.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    return index, sizes


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for every pair sharing ≥1 shingle.

    Returns (id_a, id_b, jaccard) with id_a < id_b. The self-join runs on
    the shingle inverted index, so disjoint documents never meet.
    """
    index, sizes = _shingle_index(df, id_col, text_col, n, max_doc_freq)
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
    out = (
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
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


_MERSENNE_31 = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic (a, b) multiply-add constants for the universal hash
    family h_i(x) = (a_i·x + b_i) mod (2³¹−1), a_i ≠ 0."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_perm: int = 64
) -> DataFrame:
    """Per-doc MinHash signature: each shingle is string-hashed ONCE
    (xxhash64 → mod 2³¹−1), then the ``num_perm`` permutations are derived
    with a multiply-add universal hash family — integer ops, not repeated
    string hashing (~10× cheaper signatures; a_i·x + b_i stays < 2⁶² so the
    arithmetic is exact even under ANSI overflow checking). One explode +
    one groupBy — no per-row Python."""
    # Multiset shingles suffice: min(hash) over a multiset equals min over
    # the set, so the array_distinct cost is skipped entirely.
    exploded = df.select(
        F.col(id_col).alias("doc"), F.explode(shingle_multiset(text_col, n)).alias("s")
    )
    base = F.pmod(F.xxhash64("s"), F.lit(_MERSENNE_31))
    # num_perm hash families as COLUMNS, not exploded rows: the groupBy
    # computes num_perm partial mins map-side, so the only shuffle carries
    # one row per doc (num_perm longs) instead of docs × shingles × perms
    # rows. ~60× less shuffle volume at num_perm=64.
    hashed = exploded.select(
        "doc",
        *[
            F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE_31)).alias(f"h{i}")
            for i, (a, b) in enumerate(_perm_params(num_perm))
        ],
    )
    return hashed.groupBy("doc").agg(
        F.array(*[F.min(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified.

    Banding: ``bands`` bands of ``num_perm/bands`` rows; docs colliding in
    any band become candidates (collision prob ≈ 1-(1-j^r)^b). Candidates
    are then verified with exact shingle Jaccard, so precision is exact and
    only recall depends on the signature — the standard corpus-scale design.
    Returns (id_a, id_b, jaccard ≥ threshold).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm)
    banded = sigs.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r))).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    # Exact-verify ONLY the candidates: join their shingle sets and compute
    # |A∩B| / |A∪B| per pair — O(candidates), not O(all overlapping pairs).
    sh = df.select(F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh"))
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit sum of token-hash
    bits (+1/-1). Expressed as explode(token)×explode(bit) + groupBy —
    shuffles once on (doc, bit), once on doc."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokenize(normalize_text(text_col))).alias("t")
    )
    hashed = toks.select("doc", F.xxhash64("t").alias("h"))
    # Shift amounts must be Python ints for shiftright/shiftleft, so the
    # 64-bit loop unrolls at plan-build time — 64 literal expressions, all
    # inside one codegen stage; the per-(doc,bit) partial sums combine
    # map-side before the single shuffle on doc.
    bits = hashed.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                    for i in range(64)
                ]
            )
        ).alias("bit", "sign"),
    )
    per_bit = bits.groupBy("doc", "bit").agg(F.sum("sign").alias("s"))
    # Bit 63's weight is the sign bit: -(2^63) in two's complement, so the
    # packed value is an ordinary signed long (1 << 63 would overflow).
    weights = F.array(
        *[F.lit(1 << i).cast("long") for i in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )
    return (
        per_bit.groupBy("doc")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.element_at(weights, F.col("bit").cast("int") + 1)
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking by pigeonhole: split the 64-bit hash into ``max_hamming + 1``
    chunks — any pair within the Hamming budget must agree exactly on at
    least one chunk, so an equi-join per chunk finds all candidates without
    a cross product. Exact xor/bit_count filter applies after.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = simhash(df, id_col, text_col)
    blocked = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc", "simhash", "ck.chunk", "ck.key")
    return (
        blocked.alias("x")
        .join(blocked.alias("y"), ["chunk", "key"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
