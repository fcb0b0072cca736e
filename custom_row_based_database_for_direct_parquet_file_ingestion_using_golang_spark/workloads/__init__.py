"""Driver-facing workload: the query inventory for correctness + bench.

Submodules register into the shared registry on import:
  core       — the reference's own operator surface (SURVEY.md §2.1-2.6)
  relational — beyond-reference relational tier (joins, windows, set ops,
               subqueries — SURVEY.md §2.8 "our engine" column)
  scale      — LLM-data-pipeline tier (dedup, similarity, text analysis)
"""

from .registry import QUERIES, ORACLES, load, query, r2  # noqa: F401
from . import core  # noqa: F401, E402
from . import relational  # noqa: F401, E402
from . import scale  # noqa: F401, E402
from . import streaming  # noqa: F401, E402
from . import ranking  # noqa: F401, E402

# Driver-facing priority order. The correctness gate samples a prefix of the
# registered inventory (~50 entries per round), so the order below rotates
# each round to keep every row's evidence at most one round stale. Round-4
# curation: (0) the two entries whose newest green row is ROUND 1 — the
# stalest evidence in the registry; (1) the five dedup/ANN entries whose
# code materially changed in r3 (shingle-index checkpoint, minhash/simhash
# UDF rewrites, IVF hash sampling) but were cut from r3's 50-slot window —
# their only r3-era verification is local pytest; (2) entries NEW or
# code-touched in round 4 (real BMP/WAV decode, z-order dialect round-trip,
# bm25 synthetic-index pivot, pack_sequences integer DIV, decode_image/
# decode_audio dispatch restructure behind the three old multimodal rows);
# (3) the round-2-green block, most-central surface first. The ~5 entries
# past the 50-slot window (hash-deterministic sampling/split, embedding
# norms, JSON extraction) have unchanged code, r2 green rows, and full
# pytest parity coverage — the least-risky evidence to let age one round.
# Every name must exist in QUERIES; ordered_queries() raises otherwise so a
# rename can't silently drop an entry from the gate window.
PRIORITY: list[str] = [
    # (0) round-1-only evidence — stalest rows in the registry.
    "agg_count_distinct",
    "agg_percentiles",
    # (1) code changed in r3, cut from r3's window — re-verify first.
    "dedup_ngram_jaccard_top20",
    "dedup_duplicate_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_top10",
    # (2) new or code-touched in round 4.
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "multimodal_avi_frame_sample",
    "zorder_optimized_scan",
    "bm25_top10",
    "corpus_pack_sequences",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    # (3) round-2-green block: reference core + relational shapes.
    "q01_pricing_summary",
    "scan_full_table",
    "filter_compare",
    "weak_typing_filter",
    "agg_group_having",
    "refsql_group_having_order",
    "join_revenue_per_nation",
    "window_topk_per_group",
    "asof_click_to_purchase",
    "q16_supplier_part_counts",
    "q19_disjunctive_revenue",
    "q20_excess_volume_suppliers",
    "q21_sole_late_suppliers",
    # (3) round-2-green block: text-analysis tier.
    "text_token_stats",
    "text_quality_scores",
    "text_lang_breakdown",
    "text_repetition_ratio",
    "text_type_token_ratio",
    "corpus_top_bigrams",
    "contamination_eval_train_overlap",
    "text_pii_redact",
    # (3) round-2-green block: dedup / similarity tier.
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "corpus_line_dedup",
    "dedup_embedding_neardup",
    "ann_brute_force_top10",
    "similar_pairs_top15",
    "ann_lsh_top10",
    # (3) round-2-green block: streaming tier.
    "stream_tumbling_counts",
    "stream_sliding_window",
    "stream_session_windows",
    "stream_dedup_within_watermark",
    "stream_stateful_user_totals",
    "stream_stream_join",
    # -- ~50-slot window boundary: the entries below have unchanged code,
    # r2 green rows, and pytest parity pins — safe to age one round.
    "sample_hash_deterministic",
    "split_train_eval_stratified",
    "embedding_norms_stats",
    "json_extract_props",
    "cube_status_priority",
    "text_fingerprints",
]


def ordered_queries() -> dict[str, "registry.QueryFn"]:  # noqa: F821
    """Full inventory, priority entries first, the rest in registration order."""
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        # A real raise, not assert: under `python -O` an assert is stripped
        # and a rename would silently drop the entry from the gate window —
        # the exact failure this check exists to prevent.
        raise ValueError(f"PRIORITY names not registered: {missing}")
    out = {n: QUERIES[n] for n in PRIORITY}
    out.update((n, fn) for n, fn in QUERIES.items() if n not in out)
    return out


def ordered_oracles() -> dict[str, str]:
    """ORACLES in the same curated order as ordered_queries()."""
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
