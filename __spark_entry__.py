"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`azure_batch_map_reduce_spark.registry` — every engine
operator registers itself there with a PySpark builder and (when
SQL-expressible) a DuckDB oracle; this module just exposes the registry in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from azure_batch_map_reduce_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Round-4 verification ordering (the driver samples 50/round; rounds
# 1-3 verified 149 unique queries, 146 green). This round's 50-query
# window, per the r3 verdict's tasks 1+2+8:
#   1. q247 — the only ever-red driver row (hash-fail r2, fixed in
#      commit 4fc88cc); promoted to the very front for its green
#      confirmation.
#   2. q90 — rows-only in r3 (err: "no_oracle"); now carries a real
#      DuckDB glob()-based oracle, so the re-sample flips it to a
#      full hash row.
#   3. q256..q303 — the first 48 of the 92 round-3 operators (all
#      locally differential-verified at sf0.001/0.01/0.1 with the
#      driver's own comparator, none driver-sampled yet).
# The rest of q304-q347 plus the round-4 additions queue next for r5;
# already-verified queries follow via _ordered()'s registry
# fallthrough.
_VERIFY_FIRST = [
    "q247_seasonal_decompose",
    "q90_file_manifest",
    # ---- round-3 operators, in q-order ----
    "q256_bradley_terry_preferences",
    "q257_bigram_lm_filter",
    "q258_semantic_cluster_dedup",
    "q259_rag_context_assembly",
    "q260_substring_shingle_overlap",
    "q261_score_calibration_ece",
    "q262_corpus_version_diff",
    "q263_token_budget_waterfill",
    "q264_doremi_mixture_reweight",
    "q265_poisson_bootstrap_ci",
    "q266_class_balanced_undersample",
    "q267_stateful_rate_limit",
    "q268_scd2_history",
    "q269_stream_dist_drift",
    "q270_ivf_recall_audit",
    "q271_dedup_transitive_safety",
    "q272_maxsim_late_interaction",
    "q273_segment_boilerplate_removal",
    "q274_positional_inverted_index",
    "q275_stream_left_outer_join",
    "q276_kmv_overlap_estimate",
    "q277_isotonic_calibration",
    "q278_fellegi_sunter_weights",
    "q279_acf_daily_autocorrelation",
    "q280_multiprobe_lsh_ann",
    "q281_gazetteer_span_match",
    "q282_wfq_interleave_schedule",
    "q283_ngram_novelty_curve",
    "q284_lsh_s_curve_tuning",
    "q285_mergeable_quantile_histogram",
    "q286_mmr_diversified_topk",
    "q287_streaming_hll_distinct",
    "q288_span_corruption_plan",
    "q289_fim_split_plan",
    "q290_lpt_shard_balancing",
    "q291_weak_supervision_lf_summary",
    "q292_dynamic_partition_overwrite",
    "q293_ndcg_retrieval_eval",
    "q294_sliding_hll_union",
    "q295_shapley_attribution",
    "q296_adamic_adar_links",
    "q297_winnowing_fingerprints",
    "q298_holt_linear_forecast",
    "q299_active_learning_batch",
    "q300_speculative_draft_acceptance",
    "q301_lambda_reconciliation",
    "q302_cms_join_size_estimate",
    "q303_phrase_query_positional",
    "q304_out_of_order_profile",
    "q305_watermark_delay_recommendation",
    "q306_negative_sampling_table",
    "q307_submodular_coverage_selection",
    "q308_neyman_allocation",
    "q309_bloom_join_pruning",
    "q310_late_arriving_dimension",
    "q311_sq8_quantization_audit",
    "q312_knn_hubness_audit",
    "q313_shard_entropy_balance",
    "q314_funnel_step_latency",
    "q315_observed_metrics",
    "q316_zone_map_skipping",
    "q317_referential_integrity_audit",
    "q318_cuped_variance_reduction",
    "q319_feature_screening",
    "q320_difference_in_differences",
    "q321_dataset_card",
    "q322_kaplan_meier_survival",
    "q323_bh_fdr_control",
    "q324_mcnemar_paired_eval",
    "q325_prefix_cache_sharing",
    "q326_tokenizer_fertility",
    "q327_jl_projection_distortion",
    "q328_shipping_priority",
    "q329_large_volume_orders",
    "q330_late_shipment_priority",
    "q331_column_masking_policy",
    "q332_symspell_typo_correction",
    "q333_conformal_prediction",
    "q334_quantile_treatment_effect",
    "q335_holt_winters_seasonal",
    "q336_uplift_qini_curve",
    "q337_knn_shapley_valuation",
    "q338_epoch_shuffle_plan",
    "q339_power_analysis_sample_size",
    "q340_position_based_attribution",
    "q341_multiple_regression_closed_form",
    "q342_ridge_regularization_path",
    "q343_linear_model_gd_steps",
    "q344_welch_t_test",
    "q345_cohort_ltv_matrix",
    "q346_incremental_index_maintenance",
    "q347_srm_check",
    "q156_portable_hll",
    "q159_bitmap_distinct_rollup",
    "q162_skyline",
    "q174_bag_setops",
    "q193_ordered_listagg",
    "q194_explode_outer_semantics",
    "q196_portable_bloom_filter",
    "q203_percentile_disc_vs_cont",
    "q208_histogram_2d",
    "q213_date_spine",
    "q216_union_schema_reconcile",
    "q222_fit_transform_bucketing",
    "q223_sharded_exact_topk",
    "q238_recursive_month_spine",
    "q21_revenue_by_nation",
    "q27_asof_join",
    "q136_market_basket_lift",
    "q180_order_count_distribution",
    "q211_spatial_grid_join",
    "q212_item_cf_cosine",
    "q219_cold_start_fallback",
    "q234_order_reconciliation",
    "q237_window_group_limit_topk",
    "q30_topk_per_group",
    "q31_running_total",
    "q32_lag_lead",
    "q33_moving_sum",
    "q34_rank_ntile",
    "q35_first_last_nth",
    "q36_range_frame",
    "q88_event_transitions",
    "q89_funnel_conversion",
    "q104_gapfill_resample",
    "q108_time_weighted_avg",
    "q117_distribution_ranks",
    "q126_linear_interpolation",
    "q127_trailing_time_window",
    "q128_cumulative_distinct",
    "q130_session_paths",
    "q131_retention_cohorts",
    "q137_ohlc_bars",
    "q145_cusum_changepoint",
    "q148_rolling_active_users",
    "q149_activity_streaks",
    "q152_last_touch_attribution",
    "q160_seasonal_anomaly",
    "q165_window_funnel",
    "q178_theil_sen",
    "q179_burstiness",
    "q182_rolling_corr",
    "q188_rate_alert_baseline",
    "q189_mom_revenue_change",
    "q199_decayed_activity_score",
    "q201_trending_windows",
    "q217_sprt_sequential_test",
    "q227_sequence_feature_frame",
    "q233_duplicate_payment_rule",
    "q105_key_skew_profile",
    "q229_salting_plan",
    "q54_pii_scrub",
    "q57_repetition_signals",
    "q69_contamination_check",
    "q74_centroid_assign",
    "q75_shard_plan",
    "q76_embedding_quantize",
    "q77_mix_plan",
    "q102_reservoir_per_group",
    "q112_priority_sample",
    "q119_winsorize",
    "q123_sequence_packing",
    "q151_quantile_normalization",
    "q170_correlated_sample_join",
    "q195_group_aware_split",
    "q225_slice_evaluation",
    "q161_grouped_ewma",
    "q50_token_stats",
    "q51_quality_score",
    "q52_langid",
    "q53_fingerprint",
    "q55_deterministic_split",
    "q56_stratified_sample",
    "q78_tfidf_keywords",
    "q113_token_entropy",
    "q124_vocab_coverage",
    "q135_skipgram_pairs",
    "q143_bigram_surprisal",
    "q146_source_vocab_jaccard",
    "q158_heavy_hitters",
    "q175_pmi_collocations",
    "q184_zipf_token_slope",
    "q187_url_domain_mix",
    "q202_vocab_dictionary",
    "q215_token_offsets",
    "q220_numericalize_corpus",
    "q221_feature_hashing",
    "q230_mergeable_corpus_stats",
    "q92_multimodal_pipeline",
    "q147_frame_sampling",
    "q164_vad_segments",
    "q214_modality_alignment",
    "q81_sliding_window",
    "q83_dedup_events",
    "q142_stream_static_enrich",
    "q172_stream_windowed_distinct",
    "q192_lateness_profile",
    "q198_debounce_events",
    # ---- round-4 additions (never sampled yet) ----
    "q348_returned_item_customers",
    "q349_ship_delay_priority_mix",
    "q350_promo_revenue_share",
    "q351_disjunctive_predicate_revenue",
    "q352_inactive_high_balance",
    "q353_mann_whitney_u",
    "q354_ips_offpolicy_eval",
    "q355_spearman_rank_correlation",
    "q356_dsir_importance_resampling",
    "q357_chunk_first_occurrence_dedup",
    "q358_encoding_corruption_audit",
    "q359_largest_remainder_allocation",
    "q360_query_likelihood_dirichlet",
    "q361_incremental_aggregate_maintenance",
    "q362_merkle_antientropy_repair",
    "q363_token_budget_knapsack",
    "q364_stream_full_outer_join",
    "q365_bitemporal_asof",
    "q366_simpson_paradox_detector",
    "q367_rendezvous_hash_churn",
    "q368_kneser_ney_bigram_lm",
    "q369_postings_delta_varint_size",
    "q370_slo_burn_rate_alert",
    "q371_split_leakage_audit",
    "q372_ljung_box_whiteness",
    "q373_markov_removal_attribution",
    "q374_empirical_bayes_shrinkage",
    "q375_fleiss_kappa_agreement",
    "q376_range_partition_planner",
    "q377_team_draft_interleave",
    "q378_als_user_factor_step",
    "q379_oneway_anova",
    "q380_gini_concentration",
    "q381_heaps_law_fit",
    "q382_count_overdispersion",
    "q383_propensity_score_matching",
    "q384_neardup_modularity",
    "q385_transition_entropy",
]


def _ordered():
    reg = load_all()
    out = {n: reg[n] for n in _VERIFY_FIRST if n in reg}
    out.update((n, q) for n, q in reg.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only checks omit their entry.

    Path-dependent oracles (q90's ``read_blob`` directory stat) carry a
    ``__SF_DIR__`` placeholder — DuckDB table functions only accept
    constant paths — substituted here with the driver's documented
    sf=0.01 comparison grain (the local differential substitutes its
    own active dir instead)."""
    return {
        name: q.oracle.replace("__SF_DIR__", "/root/testdata/sf0.01")
        for name, q in _ordered().items()
        if q.oracle is not None
    }
