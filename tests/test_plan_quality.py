"""Plan-quality guard: no sampled registry operator may compile to a
CartesianProduct. Every cross join in the codebase is a 1-row/broadcast
scalar fan (which Spark plans as BroadcastNestedLoopJoin) or a keyed
join — an actual CartesianProduct in any plan means a join condition
was lost (the classic silent O(N²) regression). Plans are BUILT, not
executed, so the whole sample stays cheap."""

from __future__ import annotations

import pytest

from docix_spark.driver_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# A deliberate cross-section: search, ANN, dedup, events, relational,
# window-heavy, two-pass-sharded, and scalar-fan ops.
SAMPLE = [
    "bm25_topk", "composite_search", "rescore_topn", "mmr_rerank",
    "balanced_interleaving_eval", "rank_feature_search",
    "ann_ivf_batch", "ann_recall_by_scancost", "ann_mutual_knn",
    "semdedup", "semdedup_threshold_histogram", "minhash_lsh_pairs",
    "blocking_strategy_compare", "lsh_candidate_recall",
    "dedup_connected_components", "dedup_df_shift_topk",
    "pack_sequences", "pack_sequences_split", "global_row_ids",
    "watermark_drop_curve", "rle_run_census",
    "orders_value_recency_skyline",
    "events_sessionize", "events_funnel", "midnight_crossing_sessions",
    "events_daily_envelope", "daily_hurst_estimate", "idle_hours_census",
    "orders_nation_revenue", "large_orders_topk", "join_histogram_estimate",
    "nation_trade_balance", "simpson_check_discount",
    "salting_effect_curve", "ab_power_table", "peak_day_concentration",
    "kmv_distinct_estimate", "hash_coordinate_uniformity",
    "blockmax_tightness_curve", "postings_roaring_estimate",
    # late-round additions
    "attribution_model_compare", "kmv_union_estimate",
    "quality_gate_kappa",
    "order_ship_month_matrix", "lifetime_entry_exit_matrix",
    "resurrected_conversion_rate", "type_share_volatility",
    "first_order_ltv_corr", "brand_loyalty_histogram",
    "purchase_streak_histogram", "half_mass_window",
    # sessions 197-206
    "runtime_filter_benefit", "km_conversion_survival",
    "zorder_pruning_estimate", "tiered_index_plan", "lfu_cache_hit_curve",
    "user_runs_test", "filter_order_advisor", "stream_state_size_curve",
    "linkage_mu_weights", "ab_sprt_curve", "minhash_collision_calibration",
    "theil_sen_daily_trend", "cep_pattern_match", "part_name_fuzzy_pairs",
    "switchback_readout", "weighted_jaccard_pairs", "date_partition_advisor",
    "batch_exposure_fairness",
    # sessions 207-222
    "err_eval", "markov_steps_to_purchase", "systematic_pps_sample",
    "wasserstein_length_pairs", "fusion_headroom_eval",
    "equidepth_selectivity_estimate", "bbit_minhash_estimate",
    "best_split_changepoint", "quality_gate_pr_auc",
    "ann_adaptive_nprobe_eval", "gate_shapley_attribution",
    "quality_stump_threshold", "brand_pvm_bridge", "part_abc_xyz_matrix",
    "bandit_greedy_replay", "learned_index_error",
    "part_reuse_distance_histogram", "degree_powerlaw_xmin",
    "logbucket_quantile_estimate",
    # sessions 223-226
    "ann_hits_scores", "quality_items_vif", "source_id_range_tiling",
    "logrank_activity_conversion", "touch_shapley_attribution",
    "ann_margin_recall_corr", "ann_result_ild", "autocomplete_self_mrr",
]


def test_sample_unique():
    """Each guard slot must cover a distinct operator (ADVICE r4)."""
    assert len(SAMPLE) == len(set(SAMPLE))


@pytest.mark.parametrize("name", SAMPLE)
def test_no_cartesian_product(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: plan contains a CartesianProduct — a join condition was "
        f"lost somewhere in the op's chain"
    )


@pytest.mark.parametrize("name", SAMPLE[:40])
def test_no_python_udf_in_hot_paths(spark, name):
    """The stay-JVM-side rule as a guard: none of the sampled registry
    plans may contain a row-at-a-time Python eval (BatchEvalPython) or
    an Arrow-batched one (ArrowEvalPython) — every expression in the
    contract surface is built-in/codegen-able by design, and a UDF
    sneaking in would silently put Python back in a hot path."""
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        f"{name}: plan contains a Python UDF eval node"
    )
