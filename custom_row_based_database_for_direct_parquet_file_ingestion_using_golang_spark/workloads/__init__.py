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
from . import timeseries  # noqa: F401, E402

# Driver-facing priority order. The correctness gate samples a prefix of the
# registered inventory (~50 entries per round), so the order below rotates
# each round to keep every row's evidence at most ~two rounds stale (the
# best achievable at 152 entries / 50 slots). Round-6 curation: (0) the
# round-3-green block deferred past the round-5 boundary — three rounds
# stale now, the oldest evidence in the registry, so it leads; (1) the 23
# entries NEW in round 6 (set-op/EXISTS/IS NULL/SAMPLE/scalar-subquery/
# ROLLUP/window-frame dialect drives, SemDeDup, edit-distance dedup, ORC
# round-trip, vocabulary/OOV, JPEG/MJPEG/TIFF/WebP/μ-law/FFT media,
# per-group sampling, QUALIFY). The r4 and r5 green blocks age to ≤2-3
# rounds below the boundary and lead the r7 window. Every name must
# exist in QUERIES; ordered_queries() raises otherwise so a rename can't
# silently drop an entry from the gate window.
PRIORITY: list[str] = [
    # (0) round-3 evidence deferred at r5 — stalest rows in the registry.
    "range_join_follow_events",
    "merge_upsert_orders",
    "tfidf_top3_terms",
    "events_sessionize",
    "events_value_percentiles",
    "window_lag_delta",
    "pivot_status_by_priority",
    "window_ntile_quartiles",
    "window_running_revenue",
    "rollup_status_priority",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_orders_per_customer_distribution",
    "q15_top_suppliers",
    "q17_small_quantity_revenue",
    "corpus_domain_mix",
    "corpus_token_budget_select",
    "stream_static_enrich",
    "agg_count_null_semantics",
    "agg_group_implicit_count",
    "filter_between",
    "filter_in",
    "refsql_distinct_order_limit",
    "refsql_where_like_between",
    # (projection_alias and filter_like — the thinnest r3 parser shapes,
    # pytest-pinned on every sweep — age one more round so all 23 new
    # entries fit the 50-slot window.)
    # (1) new in round 6.
    "refsql_setops_orders",
    "refsql_exists_subquery",
    "refsql_isnull_distinct_agg",
    "refsql_sample_nulls_order",
    "refsql_stats_aggregates",
    "refsql_q3_shipping",
    "refsql_cte_semi_join",
    "refsql_grouped_window_rank",
    "refsql_qualify_topk",
    "refsql_scalar_subquery",
    "refsql_rollup_orders",
    "refsql_window_frame",
    "dedup_semantic_clusters",
    "dedup_edit_distance",
    "orc_roundtrip_ingest",
    "corpus_vocab_oov",
    "corpus_sample_per_group",
    "multimodal_jpeg_decode",
    "multimodal_mjpeg_frame_sample",
    "multimodal_mulaw_decode",
    "multimodal_audio_spectrum",
    "multimodal_tiff_decode",
    "multimodal_webp_decode",
    # -- ~50-slot window boundary: everything below was green in r4 or r5
    # (≤2 rounds stale at r6) and rotates forward in r7. The r4-green
    # entries just below the line (bmp/wav/avi decode, the exact/fuzzy
    # dedup block, bm25, packing, similar-pairs) are unchanged code aged
    # one extra round to make room for the 22 new round-6 entries — and
    # their code paths are freshly exercised by the round-6 media/dedup
    # entries anyway.
    "projection_alias",
    "filter_like",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "multimodal_avi_frame_sample",
    "dedup_ngram_jaccard_top20",
    "dedup_duplicate_clusters",
    "corpus_line_dedup",
    "dedup_exact_groups",
    "dedup_embedding_neardup",
    "similar_pairs_top15",
    "bm25_top10",
    "corpus_pack_sequences",
    "dedup_exact_survivors",
    "window_topk_per_group",
    "q01_pricing_summary",
    "scan_full_table",
    "filter_compare",
    "weak_typing_filter",
    "agg_group_having",
    "agg_global",
    "distinct_values",
    "order_limit_offset",
    "filter_not_and_or",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_with_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_revenue_top20",
    "q14_promo_revenue_share",
    "q18_large_volume_customers",
    "q22_idle_rich_customers",
    "join_anti_not_exists",
    "join_outer_suppliers_per_nation",
    "join_semi_exists",
    "setop_union_intersect_except",
    "subquery_above_avg",
    "pipeline_curate_corpus",
    "contamination_eval_train_overlap",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_breakdown",
    "text_pii_redact",
    "corpus_top_bigrams",
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
