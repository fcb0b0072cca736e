"""Corpus ranking: TF-IDF term weighting and BM25 retrieval scoring.

Beyond-reference capability (the reference's query surface is single-table
relational — ``pkg/handlers/select.go:49-54``); these are the ranking
primitives an LLM-data pipeline uses for corpus triage (salient-term
extraction, query-based document selection for targeted subsets).

Scale design:
- Tokenization reuses :func:`operators.text.norm_tokens` — pure codegen'd
  Column algebra, zero Python in the row path.
- Document frequencies and corpus stats are tiny aggregates (vocabulary- or
  1-row-sized) joined back via ``broadcast`` — the only big-data shuffle is
  the (doc, term) group-count, which is map-side-combinable.
- BM25 scores for a fixed query-term list sum per-term contributions in
  FIXED textual order (pivot → column addition), not via a float ``sum()``
  aggregate — float addition isn't associative, and a shuffle-order sum
  could diverge from the DuckDB oracle's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import norm_tokens


def doc_terms(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, term, c, dl): per-document term counts plus document length.

    One explode + one map-side-combinable groupBy. Empty-string tokens
    (artifacts of splitting empty normalized text) are dropped.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), norm_tokens(text_col).alias("toks")
    ).select(
        # dl counts non-empty tokens (empty normalized text splits to [""]);
        # the same definition feeds avgdl in bm25() and the SQL oracles.
        "id",
        "toks",
        F.size(F.filter("toks", lambda t: t != "")).alias("dl"),
    )
    return (
        toks.select("id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("c"))
    )


def tfidf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(document, term) TF-IDF: ``c * ln((N + 1) / (df_t + 1))``.

    Smoothed IDF (the +1s) keeps corpus-wide terms finite. ``N`` is the
    total document count; ``df_t`` the number of documents containing the
    term. Both stats are broadcast back — no large-side re-shuffle beyond
    the (doc, term) count. Returns columns (id, term, tfidf), unrounded;
    callers round before ranking so cross-engine ulp noise in ``ln`` can't
    reorder ties.
    """
    tf = doc_terms(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n = docs.select(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            (
                F.col("c")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)))
            ).alias("tfidf"),
        )
    )


def bm25(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    materialize_tf: bool = True,
) -> DataFrame:
    """BM25 score of every document against a fixed bag of query ``terms``.

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    w(d, t)  = idf(t) * c * (k1 + 1) / (c + k1 * (1 - b + b * dl / avgdl))
    score(d) = w(d, terms[0]) + w(d, terms[1]) + ...   (fixed order)

    Only documents containing at least one query term appear (score > 0
    rows; BM25 of an all-miss document is 0 — filter is semantics, not
    approximation). The early ``isin(terms)`` filter means the exploded
    stream collapses to |terms| distinct keys immediately — the group-count
    shuffle carries query-sized data, not corpus-sized.

    The per-term pivot keeps the final summation a column expression in
    declared term order: deterministic float arithmetic, oracle-safe.
    """
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25 query terms must be distinct")
    tf = doc_terms(docs, id_col, text_col).filter(F.col("term").isin(terms))
    if materialize_tf:
        # tf feeds both dfreq and the score join; Spark replans shared
        # subtrees, so without this the corpus gets tokenized + scanned
        # once per consumer (3 full scans total). Post-filter tf is tiny
        # (≤ |terms| rows per matching doc), so materializing it costs one
        # small local write and drops the query to 2 corpus scans (tf +
        # avgdl stats). tfidf() deliberately does NOT do this: its tf is
        # full-vocabulary (corpus-sized), where a materialization write
        # costs more than the rescan it saves.
        tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    stats = (
        docs.select(norm_tokens(text_col).alias("toks"))
        .select(
            F.size(F.filter("toks", lambda t: t != "")).alias("dl")
        )
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    w = (
        idf
        * F.col("c")
        * F.lit(k1 + 1.0)
        / (
            F.col("c")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # Pivot on a synthetic per-term INDEX, not the raw term string: a term
    # literally named "id" would collide with the group key, and a term
    # containing a backtick would break the quoted column reference. The
    # index also pins summation order to declared term order by construction.
    ti: Column = F.lit(None).cast("int")
    for i in reversed(range(len(terms))):
        ti = F.when(F.col("term") == F.lit(terms[i]), F.lit(i)).otherwise(ti)
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("id", ti.alias("_ti"), w.alias("w"))
    )
    piv = (
        per_term.groupBy("id")
        .pivot("_ti", list(range(len(terms))))
        .agg(F.first("w"))
        .na.fill(0.0)
    )
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.col(f"`{i}`")
    return piv.select("id", score.alias("score"))
