from .catalog import REGISTRY, Query, all_queries, all_oracles, query

# importing these modules populates REGISTRY
from . import tierb  # noqa: E402,F401
from . import ext  # noqa: E402,F401

# The driver's conformance harness checks the first 50 registered
# queries (dict insertion order). Rounds 2-4 drove 123 of the 125
# registered queries to a driver-witnessed green hash (r4 was 50/50
# on an all-new window). The round-5 window completes coverage and
# guards against regression:
#   * slots 1-2: the ONLY two queries the driver has never hashed
#     (quantiles_exact, recursive_cte_sql; both added after the r4
#     rotation, both locally oracle-green) -> cumulative witnessed
#     coverage becomes 125/125.
#   * the remaining 48 slots: ~2 anchors per operator category,
#     drawn from all three witness eras (r2 Tier-B base, r3
#     LLM-pipeline, r4 additions) so a regression anywhere in the
#     surface is caught, and deliberately including every query
#     whose implementation round 5 touches (dedup_ngram_jaccard
#     gains a max-document-frequency posting-list cap;
#     dedup_clusters gains star-contraction).
# Everything outside the window stays oracle-checked locally via
# tools/oracle_check.py at sf0.01 and sf0.1 (see COVERAGE.md).
#
# ROUND-6 ROTATION NOTE: the round-5 additions dedup_keep_best and
# source_overlap_matrix (registered post-rotation; both locally
# oracle-green at sf0.01 + sf0.1) are the only queries without a
# driver witness — lead the next window with them.
_DRIVER_WINDOW = [
    # Never driver-witnessed -- evidence completion
    "quantiles_exact",
    "recursive_cte_sql",
    # Projection / filter / scalar-expression base (r2 era)
    "filter_projection",
    "case_coalesce",
    "in_between_like",
    "null_handling",
    # Aggregation + grouping analytics
    "agg_pricing_summary",
    "count_distinct",
    "agg_stats",
    "grouping_sets",
    "cube_grouping",
    # Join family
    "join_inner_broadcast",
    "join_full_outer",
    "join_semi",
    "join_anti",
    # TPC-H anchors (r2-witnessed + one r4-witnessed heavy shape)
    "tpch_q3_shipping_priority",
    "tpch_q5_region_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q21_suppliers_who_kept_waiting",
    # Window functions
    "window_rank",
    "window_range_frame",
    "window_distribution",
    # Ordering / limit
    "orderby_nulls_offset",
    "topk",
    # Set operations
    "set_union_all",
    "set_except_all",
    # Subqueries / CTEs
    "subquery_scalar",
    "subquery_correlated_exists",
    "cte_multi",
    # Scalar batteries
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_regex",
    # Events (ns timestamps)
    "events_sessionize",
    "events_hourly",
    # Dedup family (r5 touches ngram + clusters -- re-witness them)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_minhash_lsh",
    # Similarity / ANN
    "embed_cosine_topk",
    "ivf_topk_ann",
    "semantic_dedup",
    # Text analysis
    "text_language_id",
    # Batch assembly (sequence_pack = r4-witnessed anchor)
    "vocab_topk",
    "sequence_pack",
    # Time series / joins
    "rollup_cascade",
    "asof_join_events",
    # Multimodal + composed pipeline
    "multimodal_decode",
    "pipeline_curate",
]


def _reorder(window: list[str]) -> None:
    missing = [n for n in window if n not in REGISTRY]
    assert not missing, f"driver-window names not registered: {missing}"
    rest = [n for n in REGISTRY if n not in set(window)]
    ordered = {n: REGISTRY[n] for n in [*window, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_DRIVER_WINDOW)

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracles", "query"]
