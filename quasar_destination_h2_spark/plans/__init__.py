from .catalog import REGISTRY, Query, all_queries, all_oracles, query

# importing these modules populates REGISTRY
from . import tierb  # noqa: E402,F401
from . import ext  # noqa: E402,F401

# The driver's conformance harness checks the first 50 registered
# queries (dict insertion order). Rounds 2+3 drove 73 queries to a
# driver-witnessed green hash; the round-4 window swaps ALL of those
# out (they stay oracle-checked locally via tools/oracle_check.py)
# and spends every slot on queries the driver has never hashed:
# the remaining 13 TPC-H shapes + the 5 new ones, PIVOT/UNPIVOT, the
# text-analysis tail, the remaining UDF/ANN/sampling entries, the
# four sketch queries (now oracle-paired via exact anchors +
# accuracy-contract booleans), and sequence_pack (whose r3 row was
# `err: no_oracle`; it now has a full recursive-CTE hash oracle).
# The only never-witnessed query left out is quantiles_exact, whose
# exact-percentile formula is witnessed inside
# sketch_approx_quantiles' *_exact columns.
#
# ROUND-5 ROTATION NOTE: once CORRECTNESS_r04 lands green, swap this
# window back to ~2 anchors per category and include the two entries
# without a driver witness: quantiles_exact and recursive_cte_sql
# (added post-rotation in r4; both locally oracle-green).
_DRIVER_WINDOW = [
    # TPC-H reporting shapes not yet driver-witnessed
    "tpch_q2_min_price_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_lateness",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_supplier",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q22_dormant_customers",
    # Sort / limit + subquery stragglers
    "topk_with_ties",
    "subquery_scalar_select",
    # Grouping-transpose forms
    "pivot_status_matrix",
    "unpivot_nation_metrics",
    # Events JSON access
    "events_json_props",
    # Dedup / similarity tail
    "minhash_signatures",
    "text_simhash",
    "ann_lsh_bucketed",
    "embed_dedup_pairs",
    "ivf_topk_ann_nprobe2",
    # Text-analysis tail
    "text_token_stats",
    "text_quality",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_pattern_flags",
    "text_repetition",
    "text_fingerprints",
    "text_boilerplate",
    "contamination_check",
    # Batch assembly / sampling
    "sample_stratified",
    "dataset_split",
    "shuffle_shards",
    "mixture_sample",
    "sequence_pack",
    # Sketches (new oracles this round)
    "sketch_user_rollup",
    "sketch_approx_distinct",
    "sketch_approx_quantiles",
    "sketch_theta_overlap",
    # Joins / UDF / multimodal tail
    "salted_join_agg",
    "udf_vowel_stats",
    "udf_weighted_mean",
    "multimodal_resize",
    "multimodal_frame_sample",
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
