"""Sequence packing: assign documents to fixed-context training sequences.

The GPT-style pretraining layout concatenates a shard's documents in a
deterministic order and slices the token stream into ``ctx_len`` windows; a
document "belongs" to the sequence containing its first token. That
assignment is a per-shard cumulative token sum — pure window algebra, no
Python, and exactly mirrorable in SQL for the oracle gate.

Scale design: the window partitions by the shard column (``source`` here —
in production the pre-assigned output shard), so each partition's running
sum is independent: ONE shuffle, no global ordering, no single-partition
window. Packing is deterministic given (shard, order) — re-runs and
engines agree byte-for-byte, which is what makes training-data builds
reproducible and resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    order_col: str,
    tokens_col: str,
    shard_col: str,
    ctx_len: int,
) -> DataFrame:
    """Append ``seq_id``: 0-based index of the ctx_len-token sequence that
    this document's first token lands in, packing per ``shard_col`` in
    ``order_col`` order (which must be unique per shard).

    A document longer than ``ctx_len`` simply spans several sequences and
    is assigned to the first — downstream slicing handles the split; the
    assignment stays a pure integer function of the cumulative sum.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    # Integer DIV, not floor(float /): float64 loses exactness once a
    # shard's cumulative token count passes 2^53, silently corrupting the
    # assignment at extreme shard sizes. DIV stays exact for any long.
    return (
        docs.withColumn("_pack_start", start.cast("long"))
        .withColumn("seq_id", F.expr(f"_pack_start DIV {int(ctx_len)}"))
        .drop("_pack_start")
    )


def token_budget_filter(
    docs: DataFrame,
    tokens_col: str,
    shard_col: str,
    budget: int,
    order_cols: list | None = None,
) -> DataFrame:
    """Greedy per-shard selection under a token budget: walk the shard in
    ``order_cols`` order (default: longest-first, then the first column of
    the frame as tiebreak) and keep every document whose token stream
    STARTS inside the budget — the standard "best docs until we have N
    tokens" curation step. The last kept document may overrun the budget;
    packing/truncation downstream handles that, and the selection stays a
    pure prefix — deterministic, resumable, engine-independent.

    Same scale shape as :func:`pack_sequences`: one shuffle on the shard
    key, a running sum, a row-local filter. The ordering must be total
    (include a unique tiebreak) or the prefix is nondeterministic.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = order_cols or [F.col(tokens_col).desc(), F.col(docs.columns[0])]
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return docs.withColumn("_start", start).filter(
        F.col("_start") < F.lit(budget)
    ).drop("_start")


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tau: float = 0.7,
    target_frac: float = 0.5,
    mark: bool = False,
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-pretraining
    sampler, XLM-style): target share of group i ∝ n_i^tau, so tau < 1
    upweights small domains and flattens the mixture; tau = 1 keeps the
    natural distribution. Downsampling only — per-group keep rate =
    min(1, share_i · target_total / n_i) applied as a DETERMINISTIC
    md5-bucket filter on ``id_col`` (byte-identical across runs, engines,
    partitionings, task retries — no rand()).

    ``mark=True`` returns every row with a ``_mix_keep`` boolean instead
    of filtering (for auditing the realized mixture).

    Scale shape: one grouped count (map-side partial agg; the group list
    is assumed small — domains/languages), a 1-row total broadcast back,
    a broadcast join of the per-group rates, and a scan-stage hash filter.
    Everything stays in-plan: no driver collect, no rand-based sampling.
    The rate is rounded to 4 dp before the integer threshold compare so
    the same mixture replays exactly in an ANSI oracle (pow/sum ULP noise
    cannot flip a row's assignment)."""
    if tau <= 0:
        raise ValueError("tau must be positive")
    if not 0 < target_frac <= 1:
        raise ValueError("target_frac must be in (0, 1]")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    totals = counts.agg(
        F.sum("_n").alias("_N"),
        F.sum(F.pow("_n", F.lit(tau))).alias("_W"),
    )
    # totals derives from counts, so after the cross join `_n` exists on
    # both lineages — qualify every reference through its own frame.
    rates = counts.crossJoin(F.broadcast(totals)).select(
        counts[group_col],
        F.least(
            F.lit(1.0),
            F.pow(counts["_n"], F.lit(tau))
            / totals["_W"]
            * (totals["_N"] * F.lit(target_frac))
            / counts["_n"],
        ).alias("_rate"),
    )
    thr = F.round(F.col("_rate") * 10000, 0).cast("int")
    # 60 bits of md5 → u in [0, 10000) with modulo bias ~1e-14 (round-8:
    # the earlier 16-bit variant over-kept low-u buckets by up to ~8%
    # relative — 2^16 % 10000 = 5536 leftover values). md5, not xxhash,
    # so an ANSI oracle replays the exact assignment.
    u = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(10000),
    )
    marked = df.join(F.broadcast(rates), group_col).withColumn(
        "_mix_keep", u < thr
    )
    if mark:
        return marked.drop("_rate")
    return marked.filter(F.col("_mix_keep")).drop("_rate", "_mix_keep")


def pack_with_splits(
    docs: DataFrame,
    order_col: str,
    tokens_col: str,
    shard_col: str,
    ctx_len: int,
) -> DataFrame:
    """Full-fidelity GPT-style packing: where :func:`pack_sequences` only
    assigns each document to the sequence holding its FIRST token, this
    emits one row per (document, sequence) SPAN — a document crossing a
    context boundary splits, and the spans say exactly which of its
    tokens land in which sequence:

      ``(..., seq_id, tok_start, n_span_tokens)``

    with ``tok_start`` the 0-based offset inside the document. Spans of
    one document are contiguous, non-overlapping, and sum to its token
    count — the layout a training-data builder writes shard files from.

    Scale shape: ONE shuffle (the per-shard cumulative-sum window — same
    as pack_sequences); the span explode multiplies rows only by each
    doc's sequence-crossing count (≈ n_docs + total_tokens/ctx_len). All
    arithmetic is exact integer DIV/mod on longs, so the same spans
    replay in an ANSI oracle and re-runs are byte-identical."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    n = F.col(tokens_col).cast("long")
    staged = docs.withColumn("_cum", cum).filter(n > 0)
    first_seq = F.expr(f"_cum DIV {int(ctx_len)}")
    last_seq = F.expr(f"(_cum + {tokens_col} - 1) DIV {int(ctx_len)}")
    spans = staged.withColumn(
        "seq_id", F.explode(F.sequence(first_seq, last_seq))
    )
    seq_lo = F.col("seq_id") * ctx_len
    tok_start = F.greatest(F.lit(0).cast("long"), seq_lo - F.col("_cum"))
    tok_end = F.least(n, seq_lo + ctx_len - F.col("_cum"))
    return spans.withColumn("tok_start", tok_start).withColumn(
        "n_span_tokens", (tok_end - tok_start).cast("long")
    ).drop("_cum")
