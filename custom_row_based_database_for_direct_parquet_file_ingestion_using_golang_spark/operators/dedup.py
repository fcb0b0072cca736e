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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .text import (
    norm_tokens,
    normalize_text,
    shingle_multiset,
    shingles,
    shingles_from_tokens,
    tokenize,
)
from .util import ensure_parallelism, lit_double_array


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
    toked = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), norm_tokens(text_col).alias("toks")
    )
    index = toked.select(
        "doc", F.explode(shingles_from_tokens(F.col("toks"), n)).alias("s")
    ).distinct()
    # Materialize the index ONCE before any fan-out: the doc-freq-cap branch
    # plus three downstream branches (both self-join sides + the size
    # aggregate) otherwise each re-run the regex-tokenize → shingle →
    # explode → distinct pipeline — plan-audited at 4 parquet scans with
    # zero exchange reuse before this checkpoint. One compact (doc, shingle)
    # row per entry, disk-spillable, same trade-off as minhash_lsh_pairs.
    index = index.localCheckpoint()
    if max_doc_freq is not None:
        # Drop stop-shingles: a shingle appearing in k docs contributes k²
        # candidate pairs — the classic skew bomb at corpus scale. Round-15:
        # the frequency cap is a WINDOW count over partitionBy(s) — one
        # shuffle of the checkpointed index, reusable by the s-keyed
        # self-join — instead of the old groupBy + semi-join + SECOND
        # checkpoint (A/B'd at ~1.4× on the top-20 workload, same rows).
        from pyspark.sql import Window

        index = (
            index.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
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
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Exact shingle-Jaccard for every pair sharing ≥1 shingle.

    Returns (id_a, id_b, jaccard) with id_a < id_b. The self-join runs on
    the shingle inverted index, so disjoint documents never meet.

    ``max_doc_freq`` drops stop-shingles (appearing in more than that many
    docs) before the self-join — a shingle in k docs contributes k²
    candidate pairs, so an uncapped run is quadratic in the hottest
    shingle's frequency. Capped ON by default (256: far above any genuine
    near-dup overlap, low enough to defuse boilerplate phrases); pass
    ``None`` only when the corpus is known skew-free. Jaccard is computed
    over the capped shingle universe (sizes recomputed after the cap) —
    callers' oracles must mirror the same cap.
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


def chunk_tokens_to_lines(
    df: DataFrame, id_col: str, tokens_col: str, tokens_per_line: int = 8
) -> DataFrame:
    """(doc, pos, line) rows: fixed-width token chunks as pseudo-lines.

    Shape matters: posexplode the CHUNK INDEX first, then slice each chunk
    in an ordinary projection. ``slice`` inside a ``transform`` lambda runs
    on the interpreted higher-order-function path (measured ~10× slower
    per doc); outside it, the same slice+concat_ws compiles into the
    codegen stage and the chunking runs at scan speed.
    """
    w = tokens_per_line
    toks = F.col(tokens_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    # Empty token array → n_chunks=0 → sequence(0, -1) would default to
    # step -1 and yield [0, -1] (two phantom empty lines); emit no rows
    # instead, matching SQL range(0, 0) = [] semantics.
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(idx).alias("pos", "i"),
        toks.alias("__t"),
    ).select(
        "doc",
        "pos",
        F.concat_ws(" ", F.slice(F.col("__t"), F.col("i") * w + 1, F.lit(w))).alias(
            "line"
        ),
    )


def line_dedup_stats(lines: DataFrame, max_doc_freq: int = 2) -> DataFrame:
    """C4-style line-level corpus dedup: drop every line that appears in
    more than ``max_doc_freq`` distinct documents (boilerplate — nav bars,
    cookie banners, signatures), keep the rest in order.

    Input: one row per line, columns ``(doc, pos, line)`` (e.g. from
    chunk_tokens_to_lines, or split('\\n') + posexplode for real lines).
    Output per document: ``doc``, ``n_lines``, ``n_kept``, and ``kept_fp``
    (md5 of the kept lines re-joined in position order — the fingerprint of
    the cleaned document).

    Scale shape: one aggregation on line for the document frequencies →
    the kept-filter joins against ONLY the dropped-line set (heavy
    hitters, tiny relative to the corpus — AQE broadcasts it), never
    against the full per-line frequency table → one groupBy back to docs.
    Two shuffles total on a 100 TB corpus; the reconstruction sort is
    row-local (array_sort over each doc's collected lines, not a global
    orderBy).
    """
    dropped = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc").alias("doc_freq"))
        .filter(F.col("doc_freq") > max_doc_freq)
        .select("line", F.lit(True).alias("__drop"))
    )
    flagged = lines.join(dropped, "line", "left").withColumn(
        "kept", F.col("__drop").isNull()
    )
    kept_struct = F.when(F.col("kept"), F.struct("pos", "line"))
    reconstructed = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
        ),
        " ",
    )
    return flagged.groupBy("doc").agg(
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.sum(F.col("kept").cast("int")).cast("int").alias("n_kept"),
        F.md5(F.encode(reconstructed, "UTF-8")).alias("kept_fp"),
    )


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


def _perm_mins_udf(params: list[tuple[int, int]]):
    """Arrow-vectorized pandas UDF: shingle-hash array → array of per-
    permutation minima, min_i((a_i·x + b_i) mod (2³¹−1)).

    Why a UDF here when the rest of the engine is Column algebra: Spark
    evaluates higher-order functions (transform/array_min lambdas) on the
    INTERPRETED expression path — num_perm=64 lambdas over a ~300-element
    array per doc measured seconds per 10k docs with multi-second JIT
    variance. numpy does the same exact int64 arithmetic (a·x+b < 2⁶², no
    overflow) in two vectorized passes per permutation over the flattened
    batch. Arrow batching keeps transfer columnar; the surrounding
    xxhash64 shingle hashing and band hashing stay JVM-side, so signatures
    are bit-identical to the Column-algebra formulation.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def perm_mins(bh: pd.Series) -> pd.Series:
        # None check BEFORE len(): a null shingle array must fall through to
        # the null branch (→ null signature), not raise len(None).
        lengths = np.fromiter(
            (-1 if v is None else len(v) for v in bh), dtype=np.int64, count=len(bh)
        )
        if len(lengths) == 0:
            return pd.Series([], dtype=object)
        # Null/empty rows are masked out and filled with their sentinel
        # results; the vectorized reduceat path runs on the rest. (Routing
        # the WHOLE batch through a per-row fallback when one short doc
        # appears would be a batch-wide perf cliff on real corpora.)
        good = lengths > 0
        out = np.empty(len(lengths), dtype=object)
        for i in np.nonzero(~good)[0]:
            # null array → null signature; empty array → per-permutation
            # nulls, mirroring array_min-of-empty semantics.
            out[i] = None if lengths[i] < 0 else [None] * len(params)
        if good.any():
            gl = lengths[good]
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v, g in zip(bh, good) if g]
            )
            starts = np.zeros(len(gl), dtype=np.int64)
            np.cumsum(gl[:-1], out=starts[1:])
            mins = np.empty((len(gl), len(params)), dtype=np.int64)
            # x mod (2³¹−1) via the Mersenne fold (2³¹ ≡ 1): two
            # hi+lo folds bring x < 2⁶² down to [0, M+1], one masked
            # subtract finishes — EXACTLY equal to the % result
            # (property-checked vs % in test_dedup), ~2.8× faster than
            # int64 division, and the preallocated scratch buffers keep
            # the 64-permutation loop allocation-free (round-15).
            m31 = _MERSENNE_31
            x = np.empty_like(flat)
            y = np.empty_like(flat)
            for i, (a, b) in enumerate(params):
                np.multiply(flat, a, out=x)
                np.add(x, b, out=x)
                np.bitwise_and(x, m31, out=y)
                np.right_shift(x, 31, out=x)
                np.add(y, x, out=x)
                np.bitwise_and(x, m31, out=y)
                np.right_shift(x, 31, out=x)
                np.add(y, x, out=x)
                np.subtract(x, m31, out=x, where=x >= m31)
                mins[:, i] = np.minimum.reduceat(x, starts)
            for idx, row in zip(np.nonzero(good)[0], mins):
                out[idx] = row
        return pd.Series(list(out))

    return perm_mins


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_perm: int = 64
) -> DataFrame:
    """Per-doc MinHash signature, computed ROW-LOCALLY: each shingle is
    string-hashed once (xxhash64 → mod 2³¹−1, JVM-side) into a per-row
    array, then the ``num_perm`` universal-hash minima come from one
    Arrow-vectorized batch pass (see _perm_mins_udf).

    min-over-shingles needs no aggregation across rows, so this is a pure
    projection: zero shuffle, zero explode — at 100 TB the signature stage
    runs at scan speed. (The earlier explode + groupBy formulation
    shuffled one row per doc; the pure-Column-algebra formulation was
    exchange-free but paid interpreted higher-order-function evaluation
    per permutation.)"""
    # Multiset shingles suffice: min(hash) over a multiset equals min over
    # the set, so the array_distinct cost is skipped entirely. Tokens and
    # the hashed-shingle array are staged as their own selects: each is
    # multi-referenced downstream, and a column reference is an attribute
    # read while an inlined expression would recompute regex/hash passes
    # per reference (no CSE in interpreted higher-order functions).
    toked = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), norm_tokens(text_col).alias("toks")
    )
    base = F.transform(
        shingles_from_tokens(F.col("toks"), n),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)),
    )
    hashed = toked.select("doc", base.alias("bh"))
    sig = _perm_mins_udf(_perm_params(num_perm))(F.col("bh"))
    return hashed.select("doc", sig.alias("sig"))


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
    params = _perm_params(num_perm)
    # Tokens staged once and shared by the signature AND verification
    # branches (attribute reads, not recomputed regex passes — see
    # minhash_signatures for why staging matters).
    toked = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), norm_tokens(text_col).alias("toks")
    )
    base = F.transform(
        shingles_from_tokens(F.col("toks"), n),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)),
    )
    hashed = toked.select("doc", base.alias("bh"))
    # Per-permutation minima in one Arrow-vectorized pass (_perm_mins_udf);
    # band buckets are then plain JVM element_at + xxhash64 over the
    # materialized signature array — each min feeds exactly one band.
    sigged = hashed.select(
        "doc", _perm_mins_udf(params)(F.col("bh")).alias("sig")
    )
    banded = sigged.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at(F.col("sig"), bnd * r + j + 1)
                                for j in range(r)
                            ]
                        ).alias("bucket"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    # Materialize band/bucket rows ONCE before the self-join: a broadcast
    # (or even shuffle) self-join plans two independent copies of the whole
    # signature pipeline — measured ~2× the stage cost. localCheckpoint
    # stores one compact row per (doc, band) — 16 rows of three longs per
    # doc, disk-spillable, auto-cleaned when the RDD is GC'd — comparable
    # to the shuffle the join writes anyway. (Trade-off vs persist():
    # lineage is truncated, so a lost executor means recomputing the
    # operator rather than one partition — acceptable for a bounded
    # intermediate; persist() would leak a CacheManager entry instead.)
    banded = banded.localCheckpoint()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    # Exact-verify ONLY the candidates: join their shingle sets and compute
    # |A∩B| / |A∪B| per pair — O(candidates), not O(all overlapping pairs).
    sh = toked.select(
        "doc", F.array_distinct(shingles_from_tokens(F.col("toks"), n)).alias("sh")
    )
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


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected pair list — the step that
    turns near-dup PAIRS into actionable duplicate CLUSTERS (keep one doc
    per component, drop the rest). Returns (node, comp) for every node with
    at least one edge; comp = the smallest node id in the component, i.e.
    the canonical survivor under keep-min-id policy.

    Algorithm: hash-min label propagation. Every node starts labeled with
    itself; each round every node takes the min of its own label and its
    neighbors' labels. Pure DataFrame ops — one equi-join + one groupBy per
    round, both shuffling on node id — so AQE handles skewed hub nodes and
    nothing ever collects to the driver.

    Scale shape: rounds = O(component diameter). Duplicate clusters are
    near-cliques (diameter ≤ ~3), so this converges in 3-4 rounds at any
    corpus size; the doubling variants (large-star/small-star) only pay off
    on adversarially long path graphs, which dedup graphs are not.
    localCheckpoint after each round truncates the otherwise exponentially
    growing plan; convergence is detected with a one-row aggregate — the
    label sum is monotone non-increasing and stationary exactly at the
    fixed point, so no changed-row join is needed.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").cast("long").alias("comp"))
        .localCheckpoint()
    )
    cur = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        prop = sym.join(labels, sym["b"] == labels["node"]).select(
            sym["a"].alias("node"), F.col("comp")
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        nxt = labels.agg(F.sum("comp")).first()[0]
        if nxt == cur:
            break
        cur = nxt
    return labels


def _simhash_pack_udf():
    """Arrow-vectorized pandas UDF: token-hash array → packed 64-bit SimHash.

    Why a UDF (same rationale as _perm_mins_udf): the Column formulation
    needs one interpreted higher-order F.filter pass PER BIT — 64 lambda
    evaluations over the token-hash array per row, the exact pattern already
    measured and replaced for MinHash. numpy does it in one shot per batch:
    view the flattened int64 hashes as bytes, np.unpackbits(bitorder=
    'little') → an (n_hashes, 64) bit matrix, np.add.reduceat over row
    segments → per-doc per-bit popcounts, then pack sign bits as uint64 and
    reinterpret as int64 (bit 63's two's-complement weight for free).
    Bit-identical to the Column formulation
    (_simhash_packed_column_reference), pinned by
    tests/test_dedup.py::test_simhash_udf_matches_column_reference."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def pack(hs: pd.Series) -> pd.Series:
        lengths = np.fromiter(
            (0 if v is None else len(v) for v in hs), dtype=np.int64, count=len(hs)
        )
        out = np.zeros(len(hs), dtype=np.int64)
        nz = lengths > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in hs if v is not None and len(v)]
            )
            # (n_hashes, 64) bit matrix, bit i of hash h at column i.
            # astype('<i8') forces little-endian byte order so the uint8
            # view lines up with bitorder='little' on any host (a no-copy
            # no-op on little-endian machines).
            bits = np.unpackbits(
                flat.astype("<i8", copy=False).view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            )
            nzl = lengths[nz]
            starts = np.zeros(len(nzl), dtype=np.int64)
            np.cumsum(nzl[:-1], out=starts[1:])
            # dtype=int64: accumulating in the uint8 input dtype would wrap
            # at 256 set bits (docs can have thousands of tokens).
            ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
            # sign of per-bit signed sum: 2·ones_i > n_tokens
            sign = (2 * ones) > nzl[:, None]
            packed = (
                sign.astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).sum(axis=1, dtype=np.uint64)
            out[nz] = packed.view(np.int64)
        return pd.Series(out)

    return pack


def _simhash_packed_column_reference() -> Column:
    """The pure-Column SimHash packing over an ``hs`` token-hash array —
    64 interpreted higher-order passes, kept ONLY as the independent
    reference the UDF parity test checks against (not on any hot path)."""

    def bit_set(i: int) -> Column:
        # 2·ones_i > n_tokens  ⇔  per-bit signed sum > 0
        ones = F.size(
            F.filter(
                F.col("hs"),
                lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
            )
        )
        return ones * 2 > F.size(F.col("hs"))

    # Bit 63's weight is the sign bit: -(2^63) in two's complement, so the
    # packed value is an ordinary signed long (1 << 63 would overflow).
    packed = F.lit(0).cast("long")
    for i in range(64):
        w = F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")
        packed = packed + F.when(bit_set(i), w).otherwise(F.lit(0).cast("long"))
    return packed


def _simhash_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.transform(
            tokenize(normalize_text(text_col)), lambda t: F.xxhash64(t)
        ).alias("hs"),
    )


def minhash_lsh_join(
    new: DataFrame,
    corpus: DataFrame,
    new_id: str,
    new_text: str,
    corpus_id: str,
    corpus_text: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup JOIN (round-8): pairs between a NEW batch and
    an existing CORPUS with shingle Jaccard ≥ ``threshold`` — the
    dedupe-the-incoming-crawl-against-what-we-already-have shape, without
    ever comparing new×corpus exhaustively.

    Same machinery as :func:`minhash_lsh_pairs` (row-local signatures,
    banded buckets, exact-Jaccard verify → precision exact, recall from
    the banding curve 1-(1-j^r)^b), but the band join runs NEW against
    CORPUS instead of self-joining — so a daily batch only shuffles its
    own band rows plus the corpus band rows, and at 100 TB the corpus
    side's (doc, band, bucket) index is materialized once and reused
    across batches (persist it with the corpus). Returns
    (new_doc, corpus_doc, jaccard)."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    params = _perm_params(num_perm)

    def prep(df: DataFrame, id_col: str, text_col: str):
        toked = ensure_parallelism(df).select(
            F.col(id_col).alias("doc"), norm_tokens(text_col).alias("toks")
        )
        base = F.transform(
            shingles_from_tokens(F.col("toks"), n),
            lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)),
        )
        sigged = toked.select(
            "doc", _perm_mins_udf(params)(base).alias("sig")
        )
        banded = sigged.select(
            "doc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bnd).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at(F.col("sig"), bnd * r + j + 1)
                                    for j in range(r)
                                ]
                            ).alias("bucket"),
                        )
                        for bnd in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("doc", "bb.band", "bb.bucket")
        # Materialized once — same rationale as minhash_lsh_pairs (the
        # band join would otherwise re-plan the signature pipeline).
        banded = banded.localCheckpoint()
        sh = toked.select(
            "doc",
            F.array_distinct(shingles_from_tokens(F.col("toks"), n)).alias("sh"),
        )
        return banded, sh

    nb, nsh = prep(new, new_id, new_text)
    cb, csh = prep(corpus, corpus_id, corpus_text)
    cand = (
        nb.alias("x")
        .join(cb.alias("y"), ["band", "bucket"])
        .select(
            F.col("x.doc").alias("new_doc"), F.col("y.doc").alias("corpus_doc")
        )
        .distinct()
    )
    verified = (
        cand.join(nsh.select(F.col("doc").alias("new_doc"),
                             F.col("sh").alias("sh_n")), "new_doc")
        .join(csh.select(F.col("doc").alias("corpus_doc"),
                         F.col("sh").alias("sh_c")), "corpus_doc")
        .select(
            "new_doc",
            "corpus_doc",
            (
                F.size(F.array_intersect("sh_n", "sh_c"))
                / F.size(F.array_union("sh_n", "sh_c"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "new_doc", "corpus_doc", "jaccard"
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit sum of token-hash
    bits (+1/-1), computed ROW-LOCALLY.

    Token hashing (xxhash64) stays JVM-side; the 64-bit packing is one
    Arrow-batched numpy pass (_simhash_pack_udf). Zero shuffle, zero
    explode — the whole hash is a projection, so at 100 TB the stage runs
    at scan speed. Docs with no tokens (or null text) hash to 0."""
    hashed = _simhash_tokens(df, id_col, text_col)
    return hashed.select("doc", _simhash_pack_udf()(F.col("hs")).alias("simhash"))


def hamming_pairs(
    df: DataFrame, id_col: str, hash_col: str, max_hamming: int = 3
) -> DataFrame:
    """All pairs with Hamming(hash) ≤ max_hamming over ANY 64-bit hash
    column (SimHash, image pHash, audio fingerprints, ...). Returns
    ``(id_a, id_b, hamming)``.

    Blocking by pigeonhole: split the 64-bit hash into ``max_hamming + 1``
    chunks — any pair within the Hamming budget must agree exactly on at
    least one chunk, so an equi-join per chunk finds all candidates without
    a cross product. Exact xor/bit_count filter applies after. The shuffle
    carries (id, hash, chunk-key) rows — 8-byte hashes, never payloads —
    and hot chunk keys are bounded by the hash's bit entropy.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    src = df.select(F.col(id_col).alias("doc"), F.col(hash_col).alias("h"))
    blocked = src.select(
        "doc",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("h"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc", "h", "ck.chunk", "ck.key")
    # Materialize once before the self-join — same rationale as
    # minhash_lsh_pairs: either join strategy would otherwise compute the
    # upstream hash pipeline once per side.
    blocked = blocked.localCheckpoint()
    return (
        blocked.alias("x")
        .join(blocked.alias("y"), ["chunk", "key"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.bit_count(F.col("x.h").bitwiseXOR(F.col("y.h"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming — the SimHash
    front-end over the generic :func:`hamming_pairs` blocking."""
    return hamming_pairs(
        simhash(df, id_col, text_col), "doc", "simhash", max_hamming
    )


# --- winnowing fingerprints (substring-level dedup) -------------------------

#: windows per in-kernel winnowing segment: bounds the (seg × k) uint32
#: scratch matrix to ~4·k·seg bytes (~18 MB at k=17) regardless of document
#: size. Test-tunable; the floor of 2·w in _winnow_select_udf keeps every
#: segment long enough to hold a full winnowing window.
_WINNOW_SEG_CAP = 1 << 18


def _winnow_select_udf(k: int, w: int, grams_only: bool):
    """Arrow-vectorized pandas UDF: document text → its selected winnowing
    fingerprints, computed ROW-LOCALLY in numpy.

    Why a UDF here when the rest of the engine is Column algebra (round-15
    optimization, guide §2.4/§4.2): winnowing selection is a per-document
    sliding-window MINIMUM — it needs no data from any other row, yet the
    Column-algebra formulation had to posexplode one row per CHARACTER
    (~total-corpus-chars rows of 17-char keys), shuffle them all on the doc
    id, sort, run a window pass, and pay a second full shuffle for the
    DISTINCT. Measured at sf0.1 (5k docs): 4.6 s for the old
    explode→Exchange→Window→distinct plan vs ~1.2 s single-core for the
    whole corpus in this kernel — and the UDF runs inside the scan stage,
    so the fingerprint step has ZERO exchanges and moves only the selected
    grams (~1/w of the gram stream) out of the scan. (The other previously
    measured alternative — JVM array-domain ``transform(idx, s ->
    array_min(slice(kks, s, w)))`` — was >50× slower than even the shuffle
    plan: nested higher-order functions run allocation-bound outside
    codegen.)

    Exactness: selection key order is (gram, pos) — the numpy kernel ranks
    k-gram windows via big-endian UTF-32 code-point bytes, whose order
    equals UTF-8 byte order (what Spark's UTF8String and DuckDB both
    compare), and breaks ties by position, which is exactly the old
    ``gram || lpad(pos, 9, '0')`` string key. Pinned against the
    independent pure-Python model in test_dedup (ASCII + multi-byte
    unicode + degenerate docs).

    Returns array<struct<gram,pos>> (``grams_only=False``) or the distinct
    gram array (``grams_only=True`` — the pair-mining front-end, which
    never needs positions).

    Bounded memory (round-16, r15 verdict #7): the kernel materializes its
    (windows × k) uint32 gram matrix in SEGMENTS of at most ``seg_cap``
    windows (overlapping by w−1 so every winnowing window lies inside one
    segment), never all at once — a multi-MB document previously allocated
    4·k·len(text) bytes in one Arrow batch (~680 MB for a 10 MB doc at
    k=17); the segment scratch is now ≤ ~4·k·seg_cap ≈ 18 MB whatever the
    document size. Exactness: the winnowing argmin is window-LOCAL, and
    segment-local gram ranks are order-isomorphic to global gram order
    within the segment, so each window selects the identical position
    (pinned by test_winnow_kernel_segmented_matches_unsegmented)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from pyspark.sql.functions import pandas_udf

    ret = "array<string>" if grams_only else "array<struct<gram:string,pos:int>>"
    seg_cap = max(_WINNOW_SEG_CAP, 2 * w)

    def selected_positions(cp: "np.ndarray", n: int) -> "np.ndarray":
        """Global 0-based positions of the selected grams, segment-wise."""
        spans = []
        a = 0
        while True:
            b = min(a + seg_cap, n)
            spans.append((a, b))
            if b == n:
                break
            # overlap w−1 grams so every window [j, j+w) fits one segment
            a = b - (w - 1)
        parts = []
        for a, b in spans:
            m = b - a
            # UTF-32 code points → (m, k) gram windows → void view so
            # np.unique ranks grams in code-point (== UTF-8 byte) order.
            wins = sliding_window_view(cp[a : b + k - 1], k)
            v = np.ascontiguousarray(wins.astype(">u4")).view(f"V{4 * k}")
            _, inv = np.unique(v.ravel(), return_inverse=True)
            # Composite key rank·m + pos: min over a window == lexicographic
            # min of (gram, pos) — the old concat-key order exactly.
            key = inv.astype(np.int64) * m + np.arange(m, dtype=np.int64)
            if m > w:
                sel = sliding_window_view(key, w).min(axis=1)
                if b == n:  # trailing (short) windows of the document
                    suf = np.minimum.accumulate(key[::-1])[::-1]
                    sel = np.concatenate([sel, suf[m - w + 1 :]])
            else:  # every window is a trailing (short) window
                sel = np.minimum.accumulate(key[::-1])[::-1]
            parts.append(a + (sel % m))
        return np.unique(np.concatenate(parts))

    @pandas_udf(ret)
    def select_fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or len(t) < k:
                out.append([])
                continue
            n = len(t) - k + 1
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            pos = selected_positions(cp, n)
            if grams_only:
                out.append(sorted({t[p : p + k] for p in pos}))
            else:
                out.append([(t[p : p + k], int(p) + 1) for p in pos])
        return pd.Series(out)

    return select_fps


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
    — the MOSS algorithm): from every window of ``w`` consecutive character
    ``k``-grams, select the minimal one. Guarantees: any shared substring
    of length >= w + k - 1 contributes at least one IDENTICAL selected
    fingerprint to both documents, regardless of alignment — the
    phase-independence that fixed-stride shingle sampling lacks.

    Selection key is (gram content, position) lexicographic order — using
    content order instead of a hash keeps the selection exactly
    reproducible in the SQL oracle; the known bias (lexicographically
    small grams like ' a' win more windows) is harmless for dedup — both
    copies of a duplicated span still select the same grams.

    Plan shape (round-15): selection is per-document sliding-window
    minima, computed row-locally in one Arrow-vectorized numpy pass
    (:func:`_winnow_select_udf` — measured rationale there), then a plain
    explode. ZERO exchanges in the fingerprint step (the old plan paid a
    full per-character explode→shuffle→Window→distinct, 4.6 s → ~0.9 s at
    sf0.1 for the top-15 workload). At 100 TB: cost is O(total chars) of
    row-local work at scan speed; only the selected ~1/w of grams leaves
    the scan stage.

    Returns (id_col, gram, pos) — the selected fingerprints, distinct.
    """
    fps = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            _winnow_select_udf(k, w, grams_only=False)(F.col(text_col))
        ).alias("g"),
    )
    return fps.select(
        F.col("doc").alias(id_col),
        F.col("g.gram").alias("gram"),
        F.col("g.pos").alias("pos"),
    )


def winnow_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 16,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """Document pairs ranked by the number of shared winnowed fingerprints
    (gram content, position-independent) — substring-level plagiarism /
    near-dup detection.

    ``max_doc_freq`` drops grams selected in more than that many documents
    before the self-join — the same stop-shingle insurance as
    ``jaccard_pairs``: a boilerplate gram appearing in f docs would
    contribute f² candidate pairs (the hot-key bomb at corpus scale); a
    gram that common identifies nothing anyway.

    Returns (id_a, id_b, shared), one row per pair that shares >= 1
    surviving gram. Cost: fingerprinting + one gram-keyed self-join whose
    quadratic term is capped at max_doc_freq² per gram.
    """
    # grams_only kernel: the per-doc gram set is already distinct, so the
    # old explode→DISTINCT shuffle disappears; materialize BEFORE the
    # doc-freq branch so the fingerprint UDF runs once, not once per
    # consumer (cap aggregate + both self-join sides).
    fp = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            _winnow_select_udf(k, w, grams_only=True)(F.col(text_col))
        ).alias("gram"),
    ).localCheckpoint()
    if max_doc_freq is not None:
        keep = (
            fp.groupBy("gram")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("gram")
        )
        fp = fp.join(keep, "gram")
    return (
        fp.alias("a")
        .join(fp.alias("b"), "gram")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    threshold: float = 0.999,
    centroids: str = "hash",
    train_limit: int = 512,
    assignment: str = "literal",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    cluster the corpus, then drop rows whose cosine similarity to a
    higher-priority row IN THE SAME CLUSTER meets ``threshold``
    (Abbas et al. 2023: clustering bounds the quadratic comparison to
    cluster-mates instead of all pairs).

    Returns ``(id_col, cluster_id, is_dup)`` — callers filter
    ``~is_dup`` for the deduplicated corpus.

    Deterministic by construction, so the whole pipeline replays in ANSI
    SQL for the oracle gate:
      * ``centroids="hash"`` (default): centroids are the ``n_clusters``
        rows with the smallest ``md5(id)`` — an engine-independent hash
        sample the ANSI oracle can replay exactly.
        ``centroids="kmeans"``: spherical k-means via
        ``similarity._train_centroids`` (the paper's setting) — better
        cluster balance at scale; deterministic for a fixed corpus but
        not SQL-replayable, so use it outside the oracle gate. The
        pipeline shape is identical either way, only the assignment
        vectors change.
      * assignment = argmax of 6-dp-rounded cosine, ties to the lowest
        centroid index (both engines agree on rounded doubles where raw
        last-ulp argmax could flip).
      * priority = ascending id (lowest id in a near-dup set survives;
        the rule is transitivity-free: a row is dropped iff ANY
        lower-id cluster-mate is similar, dropped or not — exists-join
        semantics, no iteration).

    100 TB posture: centroid pick is a TakeOrdered of k rows (hash) or a
    one-pass hash-sampled k-means (kmeans); assignment is a zero-shuffle
    map with the k·dim weights inlined as plan literals (JVM column
    algebra, no UDF); the pair stage shuffles once on cluster_id, then
    the quadratic work runs as Arrow-batched BLAS tiles inside each
    cluster task (column-chunked n×n similarity, O(n·4096) memory).

    k-ceiling: plan-literal assignment grows the plan O(k·dim), which
    caps practical n_clusters at ~10³ (see docs/SCALING.md "SemDeDup
    k-ceiling") — beyond that, broadcast the centroid matrix and assign
    in a Pandas-UDF argmax instead; the paper's k ≈ n/160 needs that
    swap well before 100 TB."""
    from .similarity import cosine

    as_double = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), as_double.alias("_v"))
    if centroids == "kmeans":
        from .similarity import _train_centroids

        cents = _train_centroids(
            base,
            id_col,
            "_v",
            train_limit=train_limit,
            n_centroids=n_clusters,
            n_iter=8,
            seed=42,
        )
    elif centroids == "hash":
        cent_rows = (
            base.withColumn("_h", F.md5(F.col(id_col).cast("string")))
            .orderBy("_h")
            .limit(n_clusters)
            .collect()
        )
        cents = [[float(x) for x in r["_v"]] for r in cent_rows]
    else:
        raise ValueError(f"centroids must be 'hash' or 'kmeans', got {centroids!r}")
    if assignment == "literal":
        # Plan-literal centroids: zero-shuffle JVM column algebra inside
        # WholeStageCodegen — best below the k-ceiling (~10^3 clusters;
        # docs/SCALING.md "SemDeDup k-ceiling").
        sims = F.array(
            *[
                F.round(cosine(F.col("_v"), lit_double_array(c)), 6)
                for c in cents
            ]
        )
        assigned = base.select(
            F.col(id_col),
            F.col("_v"),
            F.array_position(sims, F.array_max(sims))
            .cast("int")
            .alias("cluster_id"),
        )
    elif assignment == "broadcast":
        # The at-scale path the k-ceiling note prescribes: the centroid
        # matrix rides task broadcast (k·dim doubles — megabytes at
        # k=10^5, far past any plan-literal budget) and assignment is ONE
        # Arrow pass: a BLAS (batch × k) matmul + argmax per batch.
        # Still zero shuffle. Tie-breaks match the literal path exactly:
        # similarities round to 6 dp and the LOWEST centroid index wins.
        import pandas as _pd

        cmat = np.asarray(cents, dtype=np.float64)
        cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

        def assign(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                vn = v / np.linalg.norm(v, axis=1, keepdims=True)
                sims = np.round(vn @ cnorm.T, 6)
                # argmax returns the FIRST maximal index — same tie rule
                # as array_position(sims, array_max(sims)); +1 to match
                # its 1-based cluster ids.
                pdf = pdf.copy()
                pdf["cluster_id"] = (
                    sims.argmax(axis=1).astype("int32") + 1
                )
                yield pdf

        assigned = base.select(F.col(id_col), F.col("_v")).mapInPandas(
            assign,
            schema=f"{id_col} {base.schema[id_col].dataType.simpleString()}, "
            "_v array<double>, cluster_id int",
        )
    else:
        raise ValueError(
            f"assignment must be 'literal' or 'broadcast', got {assignment!r}"
        )
    # Within-cluster compare as a BLAS tile per cluster (applyInPandas):
    # one shuffle on cluster_id, then the quadratic work runs as a single
    # n×n (column-chunked) matrix product instead of n² interpreted
    # zip_with folds — the same numbers (double cosine rounded to 6 dp),
    # ~10× faster than the equivalent self-join at test scale. Chunking
    # bounds memory at O(n·4096) per task; clusters are kept narrow by
    # scaling n_clusters with corpus size (see docstring).
    from pyspark.sql import types as T

    id_field = assigned.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("cluster_id", T.IntegerType(), False),
            T.StructField("is_dup", T.BooleanType(), False),
        ]
    )

    def flag(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        dup = np.zeros(len(ids), dtype=bool)
        if len(ids) > 1:
            V = np.stack(pdf["_v"].to_numpy())[order].astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            n = len(ids)
            dup_sorted = np.zeros(n, dtype=bool)
            for lo in range(0, n, 4096):
                hi = min(lo + 4096, n)
                S = np.round(Vn @ Vn[lo:hi].T, 6)  # (n, hi-lo)
                hit = S >= threshold
                # column j (global sorted index lo+j) is a dup iff any
                # strictly-lower-sorted row (higher priority: smaller id)
                # meets the threshold.
                rows = np.arange(n).reshape(-1, 1)
                cols = np.arange(lo, hi).reshape(1, -1)
                dup_sorted[lo:hi] = (hit & (rows < cols)).any(axis=0)
            dup[order] = dup_sorted
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "is_dup": dup,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(flag, out_schema)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_dist: int = 2,
    block_prefix: int = 4,
) -> DataFrame:
    """Exact edit-distance (Levenshtein) near-dup pairs over a short key
    column — the character-level fuzzy tier the token-level
    shingle/MinHash family can't see (typo-distance duplicates).

    Blocking: candidates must share the first ``block_prefix`` characters
    AND have key lengths within ``max_dist`` (a correct necessity filter —
    edit distance ≥ length difference). The prefix block is the standard
    recall tradeoff (pairs whose edits fall inside the first
    ``block_prefix`` chars are missed — callers can union a second pass
    on reversed keys for suffix blocking); the length filter costs nothing
    (same equi-join) and prunes within the block.

    Plan: one equi-join on (prefix, a length-bucket expansion of ±0..max
    — each left row explodes into the 2·max_dist+1 length buckets it can
    pair with, so the join stays a hash equi-join, no range condition on
    the build side), then JVM-side ``levenshtein`` on the candidates.
    Quadratic only within a (prefix, length) block; at 100 TB the
    ``block_prefix`` knob bounds block width the way n_clusters bounds
    SemDeDup's — both are the paper-standard blocking tradeoffs, and both
    replay exactly in the SQL oracle."""
    if max_dist < 0 or block_prefix < 1:
        raise ValueError("max_dist must be >= 0 and block_prefix >= 1")
    keys = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_k"),
        F.substring(F.col(key_col), 1, block_prefix).alias("_p"),
        F.length(key_col).alias("_len"),
    )
    a = keys.select(
        F.col("_id").alias("id_a"),
        F.col("_k").alias("k_a"),
        F.col("_p").alias("_p"),
        F.explode(
            F.sequence(F.col("_len") - max_dist, F.col("_len") + max_dist)
        ).alias("_blk"),
    )
    b = keys.select(
        F.col("_id").alias("id_b"),
        F.col("_k").alias("k_b"),
        F.col("_p").alias("_p"),
        F.col("_len").alias("_blk"),
    )
    return (
        a.join(b, ["_p", "_blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("k_a", "k_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans — the positional dedup of Lee et
    al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"): find, per document, the maximal TOKEN-POSITION spans whose
    every k-token window also occurs elsewhere in the corpus (or at
    another position of the same document). The published pipeline CUTS
    these spans from the training text instead of dropping whole
    documents — the high-precision complement to MinHash/winnowing
    near-dup, which only score documents as units.

    Returns (id_col, span_start, span_end, span_tokens): 0-based token
    offsets over ``norm_tokens(text)``, end-exclusive, spans ≥ k tokens,
    non-overlapping and maximal per document (two duplicated k-gram
    starts p1 < p2 merge iff p2 ≤ p1 + k — their windows overlap or
    abut).

    Plan (the distributed adaptation of the paper's suffix array — a
    suffix array is cheaper in one address space but does not shard):
      1. posexplode the k-gram stream: (id, pos, xxhash64(gram)) — the
         shuffle moves 8-byte hashes + integers, never text;
      2. ONE window count over partitionBy(gram_hash) marks duplicated
         occurrences (a groupBy + self-join would shuffle the
         occurrences twice);
      3. per-document lag/running-sum merge of surviving positions into
         maximal spans (standard islands), then min/max per island — the
         island groupBy REUSES the window's hashpartitioning(_id)
         (a (_id, _span) cluster is a subset of an _id cluster).
    TWO shuffles total (plan-verified at sf0.1), each linear in token
    count; no driver-side state. Same-doc repeats count toward
    ``min_occurrences`` exactly as
    in the paper (a doc repeating a k-gram internally is a duplicate).
    xxhash64 collisions can merge distinct grams (~2^-64 per pair) — the
    paper's Bloom variants accept the same class of error.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = df.select(
        F.col(id_col).alias("_id"), norm_tokens(F.col(text_col)).alias("_t")
    )
    return _duplicate_spans_from_tokens(toks, id_col, k, min_occurrences)


def _duplicate_spans_from_tokens(
    toks: DataFrame, id_col: str, k: int, min_occurrences: int
) -> DataFrame:
    """duplicate_spans over a pre-tokenized ``(_id, _t)`` frame — the
    shared core, split out (round-15) so pipelines that already hold the
    normalized token arrays (pipeline_curate_corpus) don't re-run the
    regex tokenize pass per span stage."""
    from pyspark.sql import Window

    grams = toks.select(
        "_id",
        F.posexplode(shingles_from_tokens(F.col("_t"), k)).alias("_pos", "_g"),
        F.size("_t").alias("_n"),
    ).filter(F.col("_n") >= k)  # short docs have no k-gram to match
    occ = grams.select(
        "_id", "_pos", F.xxhash64("_g").alias("_h")
    ).withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("_h")))
    dup = occ.filter(F.col("_cnt") >= min_occurrences).select("_id", "_pos")
    return _positions_to_spans(dup, id_col, k)


def _positions_to_spans(dup: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge surviving k-gram start positions (``_id``, ``_pos``) into
    maximal per-document spans — the standard lag/running-sum islands
    merge (two k-gram starts p1 < p2 merge iff p2 ≤ p1 + k: their
    windows overlap or abut). The island groupBy REUSES the window's
    hashpartitioning(_id); end bounds are exclusive (+k)."""
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy("_pos")
    return (
        dup.withColumn("_prev", F.lag("_pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("_pos") > F.col("_prev") + k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_span", F.sum("_new").over(w))
        .groupBy("_id", "_span")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + k).alias("span_end"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Apply ``duplicate_spans``: return each document's token stream
    with every duplicated span CUT — the actual output of the Lee et al.
    2021 ExactSubstr pipeline (training text with corpus-duplicated
    substrings removed, not documents dropped).

    Returns (id_col, tokens, n_tokens, n_cut): the surviving normalized
    tokens in original order, their count, and the number removed.
    Documents with no duplicated span pass through with n_cut = 0.

    Plan: duplicate_spans (2 shuffles) → per-doc span-array rollup
    (reuses the span partitioning) → ONE left join back to the corpus on
    the id → a positional HOF filter drops tokens covered by any span
    (``F.filter``'s (element, index) form against the tiny span array —
    O(tokens × spans_per_doc) row-local work, spans_per_doc is small by
    construction since spans are merged maximal islands). The heavy text
    column never shuffles: the span side is (id, few ints) and the
    corpus side stays where it is under a broadcast-or-shuffle join that
    Catalyst picks from the span side's actual size. This variant cuts
    EVERY occurrence of a duplicated span (the conservative
    decontamination form); keep-one-copy requires a canonical-occurrence
    exemption and is intentionally out of scope."""
    spans = duplicate_spans(
        df, id_col, text_col, k=k, min_occurrences=min_occurrences
    )
    return _apply_spans(df, spans, id_col, text_col)


def cut_duplicate_spans_from_tokens(
    toks: DataFrame,
    id_col: str,
    tokens_col: str,
    k: int = 8,
    min_occurrences: int = 2,
    carry_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """:func:`cut_duplicate_spans` over a PRE-TOKENIZED frame (round-15
    optimization): callers that already hold ``norm_tokens`` arrays (and
    typically materialized them) skip the two regex tokenize re-runs the
    text-level form pays (one in duplicate_spans, one in the apply join).
    ``carry_cols`` ride through the apply join unchanged, so a scoring
    pipeline needs no second join to re-attach its features. Output:
    (id_col, *carry_cols, tokens, n_tokens, n_cut) — identical values to
    cut_duplicate_spans when ``toks[tokens_col] == norm_tokens(text)``."""
    staged = toks.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_t"),
        *[F.col(c) for c in carry_cols],
    )
    spans = _duplicate_spans_from_tokens(
        staged.select("_id", "_t"), id_col, k, min_occurrences
    )
    rolled = spans.groupBy(F.col(id_col).alias("_sid")).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    joined = staged.join(rolled, staged["_id"] == rolled["_sid"], "left")
    covered = lambda i: F.exists(  # noqa: E731 — shared by filter + count
        F.coalesce(F.col("_spans"), F.array()),
        lambda sp: (i >= sp["s"]) & (i < sp["e"]),
    )
    kept = F.filter(F.col("_t"), lambda x, i: ~covered(i))
    return joined.select(
        F.col("_id").alias(id_col),
        *[F.col(c) for c in carry_cols],
        kept.alias("tokens"),
        F.size(kept).alias("n_tokens"),
        (F.size("_t") - F.size(kept)).alias("n_cut"),
    )


def _apply_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut a span frame (``id_col``, span_start, span_end — 0-based token
    offsets, end-exclusive over ``norm_tokens(text)``) out of each
    document's token stream. Returns (id_col, tokens, n_tokens, n_cut);
    span-free documents pass through with n_cut = 0. The heavy text
    column never shuffles: the span side rolls up to (id, few ints) and
    Catalyst picks broadcast-or-shuffle from its actual size; the token
    filter is a positional HOF against the tiny per-doc span array —
    row-local, O(tokens × spans_per_doc)."""
    rolled = spans.groupBy(F.col(id_col).alias("_sid")).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    toks = df.select(
        F.col(id_col).alias("_id"), norm_tokens(F.col(text_col)).alias("_t")
    )
    joined = toks.join(rolled, toks["_id"] == rolled["_sid"], "left")
    covered = lambda i: F.exists(  # noqa: E731 — shared by filter + count
        F.coalesce(F.col("_spans"), F.array()),
        lambda sp: (i >= sp["s"]) & (i < sp["e"]),
    )
    kept = F.filter(F.col("_t"), lambda x, i: ~covered(i))
    return joined.select(
        F.col("_id").alias(id_col),
        kept.alias("tokens"),
        F.size(kept).alias("n_tokens"),
        (F.size("_t") - F.size(kept)).alias("n_cut"),
    )


def contaminated_spans(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    corpus_text_col: "str | None" = None,
) -> DataFrame:
    """Cross-corpus exact-substring contamination spans (round-13): the
    maximal token-position spans of ``df`` (the TRAINING side) whose
    every k-token window also occurs ANYWHERE in ``corpus`` (the EVAL /
    benchmark side) — the token-level decontamination complement of
    ``duplicate_spans`` (within-corpus) and of the Bloom document-level
    prefilter (operators/membership.py): instead of dropping whole
    training documents that share an n-gram with the eval set, only the
    overlapping substrings are located (and ``cut_contaminated_spans``
    removes them), preserving the rest of the document.

    Returns (id_col, span_start, span_end, span_tokens) with the same
    conventions as duplicate_spans: 0-based offsets over
    ``norm_tokens(text)``, end-exclusive, spans ≥ k tokens, maximal
    islands (gap ≤ k merges).

    Plan — the same two-shuffle shape as duplicate_spans, with the
    window count replaced by a semi-join against the eval gram set:
      1. posexplode the training k-gram stream to (id, pos,
         xxhash64(gram)) — 8-byte hashes shuffle, never text;
      2. DISTINCT eval gram hashes (eval sets are benchmark-sized, so
         this side is small — AQE broadcasts it) left-SEMI join the
         training stream on the hash;
      3. the shared islands merge (_positions_to_spans) rolls surviving
         positions into maximal spans, reusing the _id partitioning.
    xxhash64 collisions can mark a clean gram contaminated (~2^-64 per
    pair) — the conservative error direction for decontamination."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ctext = corpus_text_col or text_col
    toks = df.select(
        F.col(id_col).alias("_id"), norm_tokens(F.col(text_col)).alias("_t")
    )
    grams = toks.select(
        "_id",
        F.posexplode(shingles_from_tokens(F.col("_t"), k)).alias("_pos", "_g"),
        F.size("_t").alias("_n"),
    ).filter(F.col("_n") >= k)
    occ = grams.select("_id", "_pos", F.xxhash64("_g").alias("_h"))
    ctoks = corpus.select(norm_tokens(F.col(ctext)).alias("_t"))
    cgrams = (
        ctoks.select(
            F.explode(shingles_from_tokens(F.col("_t"), k)).alias("_g"),
            F.size("_t").alias("_n"),
        )
        .filter(F.col("_n") >= k)
        .select(F.xxhash64("_g").alias("_h"))
        .distinct()
    )
    dup = occ.join(cgrams, "_h", "left_semi").select("_id", "_pos")
    return _positions_to_spans(dup, id_col, k)


def cut_contaminated_spans(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    corpus_text_col: "str | None" = None,
) -> DataFrame:
    """Apply ``contaminated_spans``: each training document's token
    stream with every eval-overlapping span CUT — token-level benchmark
    decontamination (remove the leaked benchmark text, keep the rest of
    the document; dropping whole documents wastes data and a Bloom
    doc-level filter can't tell a 10-token leak from a full copy).
    Returns (id_col, tokens, n_tokens, n_cut); clean documents pass
    through with n_cut = 0."""
    spans = contaminated_spans(
        df, corpus, id_col, text_col, k=k, corpus_text_col=corpus_text_col
    )
    return _apply_spans(df, spans, id_col, text_col)
