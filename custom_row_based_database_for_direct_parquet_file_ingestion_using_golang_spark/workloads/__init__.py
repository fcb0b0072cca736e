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
# best achievable at 129 entries / 50 slots). Round-5 curation: (0) the six
# entries whose newest green row is ROUND 2 — the stalest evidence in the
# registry; (1) entries NEW in round 5 (time-series gapfill/interp/OHLC,
# JSONL round-trip, winnowing, column profile, activity islands, PageRank,
# real PNG/GIF decode, time-travel round-trip, int8 quantization, char-LM
# quality) or whose code changed in round 5 (lsh_topk n_planes auto-sizing
# changes ann_lsh_top10's result; the IVF training starvation threshold can
# change ann_ivf_top10's); (2) the round-3-green block — 20 of its 48
# entries; the 28 deferred past the boundary are eight TPC-H shapes whose
# join/agg machinery is identically exercised by the eight kept in-window,
# a window/rollup/pivot block covered by the kept cube/running entries,
# plus thin parser/filter shapes — all unchanged code whose oracles run in
# every local pytest sweep (test_oracle_parity covers the full registry) —
# the least-risky evidence to let age to r6, where they rotate to the front
# along with the r4-green block. Every name must exist in QUERIES;
# ordered_queries() raises otherwise so a rename can't silently drop an
# entry from the gate window.
PRIORITY: list[str] = [
    # (0) round-2 evidence — stalest rows in the registry.
    "sample_hash_deterministic",
    "split_train_eval_stratified",
    "embedding_norms_stats",
    "json_extract_props",
    "cube_status_priority",
    "text_fingerprints",
    # (1) new or code-touched in round 5.
    "ts_gapfill_locf",
    "ts_linear_interpolate",
    "ts_ohlc_daily",
    "multimodal_png_decode",
    "multimodal_gif_decode",
    "timetravel_version_as_of",
    "mv_incremental_refresh",
    "jsonl_roundtrip_ingest",
    "dedup_winnow_top15",
    "profile_orders",
    "histogram_totalprice",
    "corr_lineitem",
    "events_activity_islands",
    "graph_pagerank_knn",
    "refsql_join_customer_nation",
    "refsql_left_join_counts",
    "refsql_ctas_insert_select",
    "refsql_window_topk",
    "refsql_in_subquery",
    "refsql_q1_expression_aggregates",
    "refsql_group_by_expression",
    "embedding_quantize_int8",
    "text_char_lm_quality",
    "ann_lsh_top10",
    "ann_ivf_top10",
    # (2) round-3-green block: reference core surface.
    "agg_global",
    "distinct_values",
    "order_limit_offset",
    "filter_not_and_or",
    # (2) round-3-green block: TPC-H relational shapes.
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_with_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_revenue_top20",
    "q14_promo_revenue_share",
    "q18_large_volume_customers",
    "q22_idle_rich_customers",
    # (2) round-3-green block: joins / windows / set ops / subqueries.
    "join_anti_not_exists",
    "join_outer_suppliers_per_nation",
    "join_semi_exists",
    "setop_union_intersect_except",
    "subquery_above_avg",
    # (2) round-3-green block: events / corpus / ranking / streaming.
    "pipeline_curate_corpus",
    # -- ~50-slot window boundary: the deferred r3-green entries below
    # (eight TPC-H shapes sharing machinery with the eight kept above the
    # line, md5-bucket mixing/budget selection, broadcast static enrich,
    # and thin parser/filter shapes — all unchanged code with full
    # pytest-oracle coverage) age to r6, where they lead the window.
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
    "filter_like",
    "projection_alias",
    "refsql_distinct_order_limit",
    "refsql_where_like_between",
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
