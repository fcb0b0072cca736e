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
# each round to keep every row's evidence at most one round stale. Round-3
# curation: (0) the nine entries added this round — no driver row exists;
# (1) the two entries whose round-2 rows were red from oracle typing (both
# oracles fixed this round); (3) the 41 relational/TPC-H entries whose only
# green driver row is from round 1 (round 2's window re-verified the
# dedup/text/ANN/multimodal/streaming tier, so that tier now rotates out);
# (4) entries whose code changed since their green r2 row (jaccard doc-freq
# cap, minhash/simhash UDF rework, IVF hash-sample training) — one-round-
# fresh evidence, so they yield window space to the two-round-stale block.
# Every name must exist in QUERIES; ordered_queries() raises otherwise so a
# rename can't silently drop an entry from the gate window.
PRIORITY: list[str] = [
    # (0) entries new this round — no driver row exists yet.
    "tfidf_top3_terms",
    "bm25_top10",
    "events_sessionize",
    "events_value_percentiles",
    "merge_upsert_orders",
    "stream_static_enrich",
    "corpus_pack_sequences",
    "corpus_domain_mix",
    "corpus_token_budget_select",
    # (1) re-verify the fixed oracles first.
    "q12_priority_shipping",
    "pipeline_curate_corpus",
    # (3) round-1-only evidence: reference core surface.
    "projection_alias",
    "filter_in",
    "filter_between",
    "filter_like",
    "filter_not_and_or",
    "agg_global",
    "agg_group_implicit_count",
    "distinct_values",
    "order_limit_offset",
    "agg_count_null_semantics",
    "refsql_where_like_between",
    "refsql_distinct_order_limit",
    # (3) round-1-only evidence: relational/TPC-H tier.
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_with_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_revenue_top20",
    "q11_important_parts",
    "q13_orders_per_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_suppliers",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_idle_rich_customers",
    "join_semi_exists",
    "join_anti_not_exists",
    "join_outer_suppliers_per_nation",
    "window_running_revenue",
    "window_lag_delta",
    "window_ntile_quartiles",
    "setop_union_intersect_except",
    "subquery_above_avg",
    "rollup_status_priority",
    "pivot_status_by_priority",
    "range_join_follow_events",
    "agg_count_distinct",
    "agg_percentiles",
    # (4) code paths touched since their last driver row (all were green in
    # r2, so they outrank only the registration-order tail, not the
    # r1-stale block above; their changed code is additionally pinned by
    # plan assertions and the full local sf0.01 parity sweep).
    "dedup_ngram_jaccard_top20",
    "dedup_duplicate_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_top10",
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
