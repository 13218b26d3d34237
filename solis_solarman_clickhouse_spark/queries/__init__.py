"""Declared query surface. Importing this package populates REGISTRY."""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import order mirrors SURVEY.md §7 build order; each module registers its
# queries on import.
from . import scans  # noqa: E402,F401
from . import projections  # noqa: E402,F401
from . import filters  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import sorts_sets  # noqa: E402,F401
from . import scalar_fns  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import documents  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import funnels  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import sinks  # noqa: E402,F401
from . import graph  # noqa: E402,F401


# Round-9 ordering: the two NEW real-codec rows (mm_audio_wav_decode /
# mm_video_y4m_frames — genuine WAV/Y4M media through the real decoders)
# lead, then every query with NO driver-green row in any of r01-r08, then
# the banked r06-r08 samples, then _DRIVER_GREEN (r01-r05), then REGISTRY.
_PRIORITY = [
    "mm_audio_wav_decode", "mm_video_y4m_frames", "doc_tokens_per_char",
    "doc_winnowing_fingerprint", "doc_importance_resample",
    "doc_char_entropy", "doc_minhash_estimate_error",
    "doc_class_log_odds_terms", "join_lateral_api",
    "array_higher_order_fns", "map_higher_order_fns",
    "string_regex_extended", "ch_ipv4_functions", "sink_summing_mv",
    "ts_snapshot_diff", "ts_spectral_dominant_period", "agg_tukey_fences",
    "vec_incremental_semdedup", "vec_semdedup", "doc_quality_classifier",
    "vec_pq_quantize", "mm_image_phash_dedup", "ts_holt_forecast",
    "ch_exp_time_decayed_avg", "ch_contingency", "vec_pq_adc_topk",
    "vec_pq_adc_recall", "agg_theta_set_ops", "agg_kll_quantiles",
    "sink_bloom_layout", "doc_chunk_split", "ch_student_ttest",
    "ch_categorical_iv", "ch_stochastic_linreg", "scan_stratified_sample",
    "ts_stl_decompose", "stream_incremental_mv", "scan_merge_schema",
    "doc_bigram_lm_perplexity", "ts_kalman_1d", "json_variant_extract",
    "vec_range_search", "ch_geohash_encode", "doc_dsir_selection",
    "doc_minhash_band_sweep", "vec_binary_quantize_topk",
    "vec_binary_quantize_recall", "stream_dedup_within_watermark",
    "agg_count_min_sketch", "sub_not_in_null_trap", "vec_mips_topk",
    "agg_bloom_filter_membership", "agg_regr_multi", "ts_theil_sen_slope",
    "ingest_crc16_modbus", "udf_arrow_python",
    "vec_random_projection_recall", "join_feature_store_pit",
    "ts_sax_symbols", "ts_matrix_profile", "doc_kneser_ney_perplexity",
    "stream_union_sources", "doc_naive_bayes_langid", "vec_kmeans_lloyd",
    "ch_proportions_ztest", "sql_parameterized",
    "scan_ignore_corrupt_files", "agg_median_absolute_deviation",
    "mm_video_scene_cuts", "sink_text_roundtrip", "vec_ivf_nprobe_sweep",
    "vec_hard_negative_mining", "ts_mann_kendall_trend",
    "agg_benford_deviation", "vec_semdedup_recall", "ts_peak_detection",
    "agg_lorenz_deciles", "agg_hhi_concentration", "doc_ngram_novelty",
    "vec_mmr_diversified_topk", "agg_pareto_point", "ts_acf_correlogram",
    "udtf_analyze_polymorphic", "ch_weighted_quantiles",
    "vec_embedding_drift", "doc_max_coverage_selection",
    "ts_survival_kaplan_meier", "ch_top_event_paths",
    "ch_last_touch_attribution", "vec_ivf_balance", "agg_cuped_adjustment",
    "agg_diff_in_diff", "join_context_window_count", "ts_cross_signal_corr",
    "agg_power_sample_size", "ts_uptime_sla", "doc_temperature_mixing",
    "ts_token_bucket_admission", "vec_reciprocal_rank_fusion",
    "doc_heaps_law_fit", "vec_ndcg_eval", "vec_mrr_eval", "agg_corr_covar",
    "agg_topk_heavy_hitters", "array_posexplode_ordinality", "ch_anova",
    "ch_delta_sum", "ch_funnel_time_to_convert", "ch_group_concat",
    "ch_interval_length_sum", "ch_max_intersections", "ch_retention",
    "ch_sequence_count", "ch_sequence_match", "ch_sequence_next_node",
    "ch_theils_u", "ch_topk_weighted", "ch_uniq_up_to", "ch_window_funnel",
    "ch_window_funnel_strict_order", "doc_benchmark_decontamination",
    "doc_bm25_search", "doc_containment_dedup",
    "doc_corpus_dedup_materialize", "doc_dedup_keep_longest",
    "doc_ngram_df_top20", "doc_normalize", "doc_pack_sequences",
    "doc_pii_scrub", "doc_quality_decile", "doc_repetition_filter",
    "doc_semantic_text_dedup", "doc_shuffle_shards", "doc_source_mixing",
    "doc_tfidf_topterms", "doc_train_split", "doc_unigram_logprob",
    "doc_zipf_fit", "join_asof_nearest", "join_asof_next_event",
    "join_asof_tolerance", "join_bloom_prefilter",
    "join_broadcast_range_lookup", "join_bucketed_colocated",
    "join_left_mark", "join_null_safe_eq", "join_scd2_point_in_time",
    "join_skew_salted", "join_unmatched_audit", "mm_audio_features",
    "mm_image_resize", "set_except_all", "set_intersect_all",
    "set_union_by_name", "sink_formats_roundtrip", "sink_orc_roundtrip",
    "sql_ddl_roundtrip", "sql_recursive_cte",
    "stream_sliding_distinct_users", "stream_static_enrich",
    "stream_window_top_type", "string_collation_lcase",
    "string_fuzzy_match", "string_url_functions", "sub_correlated_agg",
    "sub_correlated_exists", "sub_in", "sub_lateral_topn", "sub_scalar",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q20",
    "tpch_q21", "tpch_q22", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "ts_anomaly_zscore",
    "ts_autocorr_lag1", "ts_calendar_heatmap", "ts_counter_reset_rate",
    "ts_cusum_changepoint", "ts_degradation_trend", "ts_drawdown",
    "ts_ema_bounded", "ts_gap_fill", "ts_hampel_outliers",
    "ts_linear_interpolate", "ts_locf_fill", "ts_lttb_downsample",
    "ts_ohlc_downsample", "ts_seasonal_naive_forecast", "ts_sequence_gaps",
    "ts_sessionize_islands", "ts_twap", "ts_wau_growth",
    "udtf_split_tokens", "vec_centroid_quality", "vec_cosine_topk_pandas",
    "vec_dedup_clusters", "vec_knn_classify", "vec_matryoshka_recall",
    "vec_norm_stats", "vec_quantize_int8", "window_cumulative_distinct",
    "window_distribution", "window_groups_frame", "window_lead_lag_offsets",
    "window_nth_value", "window_pattern_vshape", "window_peer_comparison",
    "window_range_interval", "window_ratio_to_report",
    "window_rolling_median", "graph_kcore_full", "graph_pagerank_converged",
    "doc_eyeball_panel", "doc_bitext_mining_candidates",
    "doc_pps_systematic_sample", "ts_holt_winters_additive",
    "agg_ttest_paired", "doc_tokenizer_fertility_by_lang",
    "vec_coreset_kcenter", "vec_prototype_prune",
    "doc_ccnet_perplexity_buckets", "doc_dedup_rate_by_source",
    "doc_rouge1_decontam_score", "vec_ivfpq_topk", "vec_ivfpq_recall",
    "doc_bpe_train", "doc_bpe_encode", "doc_dup_span_coverage",
    "doc_line_dedup", "graph_pagerank", "graph_triangle_count",
    "graph_common_neighbors", "graph_bfs_distance", "ch_moving_sum_array",
    "doc_weighted_jaccard_pairs", "ch_bounding_ratio", "ch_cohort_ltv",
    "date_functions_extended", "ch_sum_map", "ch_quantiles_exact",
    "ch_arg_min_max", "ch_group_concat_distinct", "ch_group_array_ordered",
    "ch_min_max_avg_map", "ch_sparkbar", "ch_group_array_last_k",
    "ch_array_cumsum_diff", "ch_array_enumerate_compact",
    "ch_event_transition_matrix", "ch_repurchase_latency",
    "ch_cohort_retention", "ch_entropy", "ch_any_heavy",
    "agg_log2_histogram", "agg_winsorized_mean", "agg_gini_coefficient",
    "agg_sprt_sequential_test", "agg_srm_check", "doc_corpus_curation",
    "doc_vocab_overlap_matrix",
]

#: Names with a driver-green row in rounds 1-5 (union of
#: CORRECTNESS_r01-r05) — kept after the never-checked tiers so a larger
#: driver budget re-confirms them before the long tail.
_DRIVER_GREEN = [
    "agg_anova_oneway", "agg_approx_distinct", "agg_approx_percentile",
    "agg_auc_roc", "agg_bit_ops", "agg_cohens_d", "agg_collect_sorted",
    "agg_contingency_residuals", "agg_count_distinct",
    "agg_count_distinct_multi", "agg_count_if_family", "agg_cramers_v",
    "agg_cube", "agg_filter_clause", "agg_global_stats", "agg_grouping_sets",
    "agg_having", "agg_histogram", "agg_histogram_equi_depth",
    "agg_hll_intersection", "agg_hll_sketch_union", "agg_k_anonymity_check",
    "agg_kendall_tau", "agg_last_point", "agg_mann_whitney_u",
    "agg_mode_deterministic", "agg_moments_skew_kurtosis", "agg_percentiles",
    "agg_pivot", "agg_population_stability_index", "agg_pythagorean_means",
    "agg_ratio_delta_method", "agg_regr_ols", "agg_rollup",
    "agg_salted_skew", "agg_table_checksum", "agg_tpch_q1",
    "agg_trimmed_mean", "agg_unpivot", "agg_weighted_median",
    "agg_welch_ttest", "array_explode", "array_functions",
    "ch_cramers_v_bias_corrected", "ch_group_bitmap_ops",
    "ch_kolmogorov_smirnov", "ch_moving_avg_array",
    "ch_quantile_exact_low_high", "ch_rank_corr", "conditional_functions",
    "date_epoch_roundtrip", "date_functions", "doc_curation_funnel_report",
    "doc_curation_v3", "doc_dataset_card", "doc_decontaminate_overlap",
    "doc_dedup_clusters", "doc_dup_cluster_size_histogram",
    "doc_exact_dedup", "doc_feature_hash_collisions", "doc_fingerprint",
    "doc_gopher_rules", "doc_incremental_dedup", "doc_langid",
    "doc_langid_agreement_kappa", "doc_lexical_diversity",
    "doc_neardup_jaccard", "doc_neardup_jaccard_capped",
    "doc_neardup_minhash", "doc_neardup_minhash_exact",
    "doc_neardup_minhash_recall", "doc_neardup_simhash",
    "doc_neardup_simhash_exact", "doc_ngram_entropy_rate",
    "doc_prefix_boilerplate_clusters", "doc_quality_calibration_ece",
    "doc_quality_score", "doc_repetition_filters", "doc_simhash_bit_balance",
    "doc_span_corruption_plan", "doc_split_leakage_report", "doc_text_stats",
    "doc_token_count_bpe", "doc_vocab_coverage_topk", "doc_vocab_kl_matrix",
    "filter_compound", "graph_connected_components",
    "graph_degree_assortativity", "graph_kcore_onion", "graph_modularity",
    "join_anti", "join_asof_latest_event", "join_cross", "join_full_outer",
    "join_interval_pairs", "join_left_outer", "join_null_skew_isolation",
    "join_semi", "join_star_revenue", "join_theta_prior_orders",
    "json_extract", "map_functions", "math_functions",
    "mm_image_aspect_buckets", "mm_image_decode", "mm_payload_exact_dedup",
    "mm_payload_meta", "mm_video_frame_sample", "proj_clamp_dropzero",
    "proj_clamp_nullsafe", "proj_revenue_expr", "scan_count_all",
    "scan_files_metadata", "scan_high_watermark_incremental",
    "scan_json_corrupt_records", "scan_observed_metrics",
    "scan_profile_stats", "scan_pruned_projection",
    "scan_reservoir_per_group", "scan_sample_hash", "scan_select_except",
    "scan_validation_report", "set_except", "set_intersect", "set_union",
    "set_union_distinct", "sink_compact_small_files",
    "sink_dynamic_partition_overwrite", "sink_idempotent_upsert",
    "sink_parquet_roundtrip", "sink_tar_shards", "sink_zorder_layout",
    "sort_multi_nulls", "sort_topk_global", "sort_topk_per_group",
    "source_python_datasource", "stream_counter_rate_stateful",
    "stream_dedup_first", "stream_ingest_e2e", "stream_peak_tracker_tws",
    "stream_session_window", "stream_sliding_window",
    "stream_stream_interval_join", "stream_stream_left_outer_join",
    "stream_tumbling_window", "stream_watermark_cut_exact",
    "stream_watermark_late_data", "string_functions", "string_regex",
    "sub_any_all_quantified", "ts_bollinger_breakouts",
    "ts_ljung_box_whiteness", "ts_pacf_durbin_levinson",
    "ts_poisson_rate_anomaly", "ts_rsi_regimes", "ts_smape_naive_baseline",
    "ts_stl_strength", "udf_grouped_agg_mean", "udf_map_in_pandas_decode",
    "udf_scalar_clamp", "vec_ann_ivf", "vec_ann_lsh", "vec_ann_recall_ivf",
    "vec_ann_recall_lsh", "vec_cosine_topk", "vec_distance_concentration",
    "vec_knn_ood_audit", "vec_label_centroids", "vec_neardup_cosine",
    "vec_pca_power_iteration", "vec_pca_project_topk", "vec_rocchio_prf",
    "vec_silhouette_simplified", "window_analytic", "window_counter_delta",
    "window_moving_avg", "window_range_frame", "window_ranking",
    "window_running_sum", "window_streak_detection",
]


def _ordered_names() -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for name in [*_PRIORITY, *_DRIVER_GREEN, *REGISTRY]:
        if name in REGISTRY and name not in seen:
            seen.add(name)
            out.append(name)
    return out


def queries_dict():
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_dict():
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
