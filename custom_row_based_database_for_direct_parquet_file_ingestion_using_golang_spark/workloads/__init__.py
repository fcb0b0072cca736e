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
# each round to keep every row's evidence as fresh as the 152-entry /
# 50-slot arithmetic allows (~3-round cycle). Round-7 curation, per the
# round-6 verdict's rotation order: (0) the three round-6 red rows whose
# DECIMAL output columns were re-typed to DOUBLE this round — they must go
# green again first; (1) the 25 entries with NO on-disk driver row at all
# (the round-5 artifact was lost, so their only evidence is pytest); (2) the
# remaining slots filled from the round-4-green block, now three rounds
# stale — the oldest driver evidence in the registry. The rest of the
# r4-green block (q2–q22, joins/setops/subqueries, pipeline/text tier) plus
# the 46 r6-green entries sit below the boundary and lead the r8 window.
# Every name must exist in QUERIES; ordered_queries() raises otherwise so a
# rename can't silently drop an entry from the gate window.
PRIORITY: list[str] = [
    # (0) round-6 red rows, re-typed (DECIMAL → DOUBLE final projection).
    "refsql_q3_shipping",
    "refsql_window_frame",
    "orc_roundtrip_ingest",
    # (1) no on-disk driver row ever (round-5 artifact lost) — pytest-only.
    "refsql_join_customer_nation",
    "refsql_left_join_counts",
    "refsql_ctas_insert_select",
    "refsql_window_topk",
    "refsql_in_subquery",
    "refsql_q1_expression_aggregates",
    "refsql_group_by_expression",
    "profile_orders",
    "histogram_totalprice",
    "corr_lineitem",
    "dedup_winnow_top15",
    "graph_pagerank_knn",
    "multimodal_png_decode",
    "multimodal_gif_decode",
    "embedding_quantize_int8",
    "text_html_strip",
    "text_char_lm_quality",
    "timetravel_version_as_of",
    "events_activity_islands",
    "jsonl_roundtrip_ingest",
    "mv_incremental_refresh",
    "ts_gapfill_locf",
    "ts_linear_interpolate",
    "ts_ohlc_daily",
    "ann_quantized_top10",
    # (1b) new in round 7.
    "bloom_decontaminate_train",
    "classifier_hashed_nb_langid",
    "refsql_merge_upsert",
    "refsql_group_by_all_ordinals",
    "corpus_chunk_sliding",
    "stream_bloom_drop_denied",
    "refsql_range_frame",
    "corpus_temperature_mix",
    "contamination_bloom_prefilter",
    "multimodal_phash_neardup",
    "multimodal_audio_neardup",
    "multimodal_video_neardup",
    "corpus_pack_split_spans",
    "refsql_derived_table",
    # (2) round-4-green block — three rounds stale, oldest driver evidence.
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "multimodal_avi_frame_sample",
    "dedup_ngram_jaccard_top20",
    "dedup_duplicate_clusters",
    "dedup_embedding_neardup",
    "scan_full_table",
    "filter_compare",
    # -- ~50-slot window boundary (50 entries above this line). Below:
    # (Displaced to fit the ten round-7 entries: the thin predicate/agg
    # shapes every refsql entry shares (weak_typing_filter,
    # agg_group_having, agg_global, distinct_values, order_limit_offset,
    # filter_not_and_or) and four r4-green entries whose operator families
    # keep other in-window representatives — similar_pairs_top15/
    # bm25_top10/corpus_pack_sequences/dedup_exact_survivors are
    # pytest+property-pinned, and blocked-BLAS / exact-dedup paths are
    # exercised by dedup_embedding_neardup and dedup_exact_groups above.
    # All of these lead the r8 window.)
    "corpus_line_dedup",
    "dedup_exact_groups",
    "q01_pricing_summary",
    "window_topk_per_group",
    "similar_pairs_top15",
    "bm25_top10",
    "corpus_pack_sequences",
    "dedup_exact_survivors",
    "weak_typing_filter",
    "agg_group_having",
    "agg_global",
    "distinct_values",
    "order_limit_offset",
    "filter_not_and_or",
    # first the rest of the r4-green block (also three rounds stale — they
    # lead the r8 window; the 50-slot budget simply ran out), then the
    # r6-green entries (1 round stale at r7), then everything unlisted in
    # registration order.
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
    "projection_alias",
    "filter_like",
    # r6-green (1 round stale at r7).
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
    "refsql_setops_orders",
    "refsql_exists_subquery",
    "refsql_isnull_distinct_agg",
    "refsql_sample_nulls_order",
    "refsql_stats_aggregates",
    "refsql_cte_semi_join",
    "refsql_grouped_window_rank",
    "refsql_qualify_topk",
    "refsql_scalar_subquery",
    "refsql_rollup_orders",
    "dedup_semantic_clusters",
    "dedup_edit_distance",
    "corpus_vocab_oov",
    "corpus_sample_per_group",
    "multimodal_jpeg_decode",
    "multimodal_mjpeg_frame_sample",
    "multimodal_mulaw_decode",
    "multimodal_audio_spectrum",
    "multimodal_tiff_decode",
    "multimodal_webp_decode",
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
