"""Registry assembly: _QUERIES_ALL / _ORACLE_SQL_ALL, the degenerate-input contract, driver stamp windows, QUERIES / ORACLE_SQL.

Mechanical split of entry_queries.py lines 24082-25607 (r13 verdict
task 6); statement order preserved. The fold below reproduces the
original single-module namespace for everything defined earlier.
"""

from __future__ import annotations

from ._fold import fold_upto

fold_upto(globals(), None)

# registry
# ---------------------------------------------------------------------------

#: ORDER MATTERS: the driver stamps correctness rows for the FIRST 50
#: entries only. Policy: the 5 reference fragmentation rows stay pinned
#: first (they must re-earn green every round), then the window is
#: filled with queries that have never received a driver stamp (rounds
#: 1-2 stamped the same 50-entry prefix; see CORRECTNESS_r01/r02).
#: Previously-stamped queries keep their r1/r2 evidence and move below
#: position 50; the remaining never-stamped entries sit right after the
#: window for the next rotation.
_QUERIES_ALL: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "frag_insert_routing": q_frag_insert_routing,
    "frag_range_counts": q_frag_range_counts,
    "frag_rr_counts": q_frag_rr_counts,
    "frag_range_query": q_frag_range_query,
    "frag_point_query": q_frag_point_query,
    "frag_reconstruction": q_frag_reconstruction,
    # -- round-4 window (positions 6-50): the 33 queries never stamped
    #    by the driver (r1-r3 windows never reached them), the 7
    #    event-time queries whose last driver row is the r2
    #    fixture-drift error (re-stamp on current schema-adaptive
    #    loaders), and 5 new round-4 operators.  After r04 every
    #    declared query has a current driver correctness row. --
    "frag_skew_report": q_frag_skew_report,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_real_resize": q_multimodal_real_resize,
    "multimodal_real_audio": q_multimodal_real_audio,
    "multimodal_real_frames": q_multimodal_real_frames,
    "ann_index_balance_audit": q_ann_index_balance_audit,
    "ann_sq8_topk": q_ann_sq8_topk,
    "data_profile": q_data_profile,
    "mcv_stats_audit": q_mcv_stats_audit,
    "heavy_hitters_salted": q_heavy_hitters_salted,
    "user_zscore_outliers": q_user_zscore_outliers,
    "quality_gate_funnel": q_quality_gate_funnel,
    "bloom_pruned_revenue": q_bloom_pruned_revenue,
    "join_null_semantics": q_join_null_semantics,
    "trimmed_mean_per_segment": q_trimmed_mean_per_segment,
    "bool_agg_battery": q_bool_agg_battery,
    "string_agg_battery": q_string_agg_battery,
    "regex_battery": q_regex_battery,
    "datetime_battery": q_datetime_battery,
    "conditional_null_battery": q_conditional_null_battery,
    "embedding_quantization": q_embedding_quantization,
    "mixture_weights": q_mixture_weights,
    "stopword_discovery": q_stopword_discovery,
    "near_dup_audit": q_near_dup_audit,
    "ann_recall_audit": q_ann_recall_audit,
    "frame_semantics_battery": q_frame_semantics_battery,
    "sequence_packing": q_sequence_packing,
    "sequence_packing_audit": q_sequence_packing_audit,
    "doc_sample_weighted": q_doc_sample_weighted,
    "benchmark_decontamination": q_benchmark_decontamination,
    "incremental_near_dup": q_incremental_near_dup,
    "orders_cdc_apply": q_orders_cdc_apply,
    "events_variant_kpis": q_events_variant_kpis,
    "user_growth": q_user_growth,
    "retention_cohorts": q_retention_cohorts,
    "curation_pipeline": q_curation_pipeline,
    "events_time_pruned": q_events_time_pruned,
    "lineitem_zorder_skip": q_lineitem_zorder_skip,
    "approx_distinct_users": q_approx_distinct_users,
    # stale r2 fixture-drift rows — re-stamp:
    "events_hourly": q_events_hourly,
    "sessionization": q_sessionization,
    "asof_click_attribution": q_asof_click_attribution,
    "streaming_hourly": q_streaming_hourly,
    "events_sliding_windows": q_events_sliding_windows,
    "session_windows": q_session_windows,
    "events_pivot": q_events_pivot,
    # new round-4 operators (positions 46-50):
    "paragraph_dedup": q_paragraph_dedup,
    "doc_char_entropy": q_doc_char_entropy,
    "pmi_collocations": q_pmi_collocations,
    "pii_redaction": q_pii_redaction,
    "bucketed_join_revenue": q_bucketed_join_revenue,
    # past the window — queued for the round-5 stamp rotation.
    # ROUND-5 ROTATION PLAN (apply at the START of round 5, never
    # mid-round): keep the 5 frag rows pinned, then fill positions 6-50
    # with every entry from here down to `doc_lm_perplexity` plus the
    # 22 round-4 additions (`doc_split_assign` … `null_ordering_battery`)
    # — after r05 every declared query has driver evidence again.
    "streaming_sessionization": q_streaming_sessionization,
    "streaming_upsert_latest": q_streaming_upsert_latest,
    "csv_quarantine_audit": q_csv_quarantine_audit,
    "salted_join_segments": q_salted_join_segments,
    "jsonl_quarantine_audit": q_jsonl_quarantine_audit,
    "doc_lm_perplexity": q_doc_lm_perplexity,
    "doc_split_assign": q_doc_split_assign,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "snapshot_diff": q_snapshot_diff,
    "gdpr_delete_audit": q_gdpr_delete_audit,
    "ewma_user_value": q_ewma_user_value,
    "vocab_oov_rate": q_vocab_oov_rate,
    "boilerplate_chunk_removal": q_boilerplate_chunk_removal,
    "bow_dedup": q_bow_dedup,
    "orc_roundtrip_agg": q_orc_roundtrip_agg,
    "schema_evolution_read": q_schema_evolution_read,
    "pagerank_copurchase": q_pagerank_copurchase,
    "triangle_count_copurchase": q_triangle_count_copurchase,
    "semantic_dedup": q_semantic_dedup,
    "binaryfile_ingest": q_binaryfile_ingest,
    "session_overlap_pairs": q_session_overlap_pairs,
    "chi_square_lang_source": q_chi_square_lang_source,
    "approx_quantile_audit": q_approx_quantile_audit,
    "streaming_topk_trending": q_streaming_topk_trending,
    "split_leakage_audit": q_split_leakage_audit,
    "dup_flow_matrix": q_dup_flow_matrix,
    "streaming_louter_attribution": q_streaming_louter_attribution,
    "group_topk_sample": q_group_topk_sample,
    "hof_battery": q_hof_battery,
    "setops_all_battery": q_setops_all_battery,
    "null_ordering_battery": q_null_ordering_battery,
    "rag_chunking": q_rag_chunking,
    "quote_detection": q_quote_detection,
    "windowed_distinct_users": q_windowed_distinct_users,
    "mad_outliers": q_mad_outliers,
    "streaming_cdc_apply": q_streaming_cdc_apply,
    "skyline_orders": q_skyline_orders,
    "doc_topic_clusters": q_doc_topic_clusters,
    "cms_join_estimate": q_cms_join_estimate,
    "equi_depth_histogram": q_equi_depth_histogram,
    "sql_interface_q1": q_sql_interface_q1,
    "multimodal_audio_windows": q_multimodal_audio_windows,
    "eval_set_builder": q_eval_set_builder,
    "xml_roundtrip_agg": q_xml_roundtrip_agg,
    "quantile_disc_battery": q_quantile_disc_battery,
    "ignore_nulls_window_battery": q_ignore_nulls_window_battery,
    "grouping_flags_battery": q_grouping_flags_battery,
    "lateral_ordinality_battery": q_lateral_ordinality_battery,
    "signed_divmod_battery": q_signed_divmod_battery,
    "ab_test_zscore": q_ab_test_zscore,
    "sprt_ab_monitor": q_sprt_ab_monitor,
    "funnel_time_to_convert": q_funnel_time_to_convert,
    # -- stamped green in r1/r2/r3 (evidence on file) --
    "multimodal_features": q_multimodal_features,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_nation_trade_flows": q7_nation_trade_flows,
    "q8_market_share": q8_market_share,
    "q9_nation_profit": q9_nation_profit,
    "q10_returned_revenue": q10_returned_revenue,
    "q11_important_parts": q11_important_parts,
    "q12_priority_line_counts": q12_priority_line_counts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue_ratio": q14_promo_revenue_ratio,
    "q15_top_suppliers": q15_top_suppliers,
    "q16_supplier_variety": q16_supplier_variety,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_dormant_high_balance": q22_dormant_high_balance,
    "rollup_cascade_daily": q_rollup_cascade_daily,
    "event_funnel": q_event_funnel,
    "user_rolling_avg": q_user_rolling_avg,
    "event_gaps": q_event_gaps,
    "events_gap_fill": q_events_gap_fill,
    "value_regression": q_value_regression,
    "incremental_rollup": q_incremental_rollup,
    "latest_event_per_user": q_latest_event_per_user,
    "simhash_near_dup_pairs": q_simhash_near_dup_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "contamination_pairs": q_contamination_pairs,
    "doc_repetition": q_doc_repetition,
    "token_histogram": q_token_histogram,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "doc_sample_stratified": q_doc_sample_stratified,
    "tfidf_top_terms": q_tfidf_top_terms,
    "orders_merge_upsert": q_orders_merge_upsert,
    "scd2_order_history": q_scd2_order_history,
    "streaming_enriched": q_streaming_enriched,
    "streaming_dedup": q_streaming_dedup,
    "streaming_attribution": q_streaming_attribution,
    "customer_window_battery": q_customer_window_battery,
    "lineitem_unpivot": q_lineitem_unpivot,
    "embedding_centroids": q_embedding_centroids,
    "chunk_dedup": q_chunk_dedup,
    "term_masking": q_term_masking,
    "frag_hash_counts": q_frag_hash_counts,
    "frag_consistent_hash_ring": q_frag_consistent_hash_ring,
    "frag_rebalance": q_frag_rebalance,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_region_nation_revenue": q5_region_nation_revenue,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_open_orders": q_customers_with_open_orders,
    "top_order_per_customer": q_top_order_per_customer,
    "sales_rollup": q_sales_rollup,
    "orders_cube": q_orders_cube,
    "distinct_parts_per_flag": q_distinct_parts_per_flag,
    "events_json_kpis": q_events_json_kpis,
    "top_event_per_user": q_top_event_per_user,
    "doc_token_stats": q_doc_token_stats,
    "dedup_exact_groups": q_dedup_exact_groups,
    "lang_id_confusion": q_lang_id_confusion,
    "quality_by_source": q_quality_by_source,
    "minhash_signatures": q_minhash_signatures,
    "minhash_near_dup_pairs": q_minhash_near_dup_pairs,
    "knn_bruteforce": q_knn_bruteforce,
    "embedding_near_dup": q_embedding_near_dup,
    "multimodal_meta": q_multimodal_meta,
    "simhash_signatures": q_simhash_signatures,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_lsh_indexed": q_ann_lsh_indexed,
    "range_join_price_bands": q_range_join_price_bands,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_priority_returns": q4_priority_returns,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "doc_fingerprints": q_doc_fingerprints,
    "bpe_token_stats": q_bpe_token_stats,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "events_value_quantiles": q_events_value_quantiles,
    "user_setops": q_user_setops,
    "ann_ivf_topk": q_ann_ivf_topk,
    "grouping_sets": q_grouping_sets,
    "scalar_functions": q_scalar_functions,
    "array_functions": q_array_functions,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    # -- round-6 additions (below the stamp window; rotate into the
    #    r7 prefix next round) --
    "event_transition_matrix": q_event_transition_matrix,
    "user_path_topk": q_user_path_topk,
    "winnowing_span_matches": q_winnowing_span_matches,
    "embedding_dim_variance": q_embedding_dim_variance,
    "domain_soft_cap": q_domain_soft_cap,
    "dsir_importance_weights": q_dsir_importance_weights,
    "gopher_quality_flags": q_gopher_quality_flags,
    "dup_span_coverage": q_dup_span_coverage,
    "kmv_set_similarity": q_kmv_set_similarity,
    "cusum_changepoint": q_cusum_changepoint,
    "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
    "bitwise_battery": q_bitwise_battery,
    "embedding_covariance_topk": q_embedding_covariance_topk,
    "map_functions_battery": q_map_functions_battery,
    "struct_order_battery": q_struct_order_battery,
    "rfm_segments": q_rfm_segments,
    "hierarchy_rollup": q_hierarchy_rollup,
    "zipf_slope": q_zipf_slope,
    "readability_scores": q_readability_scores,
    "lexical_diversity": q_lexical_diversity,
    "term_burstiness": q_term_burstiness,
    "bm25_search": q_bm25_search,
    "phrase_search_positional": q_phrase_search_positional,
    "bitmap_index_intersection": q_bitmap_index_intersection,
    "neyman_allocation_audit": q_neyman_allocation_audit,
    "soft_dedup_weights": q_soft_dedup_weights,
    "referential_integrity_audit": q_referential_integrity_audit,
    "item_cooccurrence_topk": q_item_cooccurrence_topk,
    "woe_binning": q_woe_binning,
    # -- round-7 additions (below the stamp window; rotate into the r8
    #    prefix — see _R7_ADDED) --
    "grouped_mode": q_grouped_mode,
    "benford_digit_audit": q_benford_digit_audit,
    "revenue_autocorr": q_revenue_autocorr,
    "dow_seasonality": q_dow_seasonality,
    "gini_concentration": q_gini_concentration,
    "unigram_kl_divergence": q_unigram_kl_divergence,
    "rank_functions_battery": q_rank_functions_battery,
    "ann_pq_topk": q_ann_pq_topk,
    "psi_drift": q_psi_drift,
    "ppl_tercile_buckets": q_ppl_tercile_buckets,
    "suffix_prefix_overlap_pairs": q_suffix_prefix_overlap_pairs,
    "domain_mix_entropy": q_domain_mix_entropy,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "containment_pairs": q_containment_pairs,
    "dedup_cluster_histogram": q_dedup_cluster_histogram,
    "tokenizer_fertility": q_tokenizer_fertility,
    "frag_pruning_report": q_frag_pruning_report,
    "epoch_mixture_sample": q_epoch_mixture_sample,
    "embedding_norm_audit": q_embedding_norm_audit,
    "lsh_banding_curve": q_lsh_banding_curve,
    "copurchase_bfs_hops": q_copurchase_bfs_hops,
    "mink_prob_contamination": q_mink_prob_contamination,
    "theil_sen_trend": q_theil_sen_trend,
    "hard_negative_mining": q_hard_negative_mining,
    "quantile_normalize_audit": q_quantile_normalize_audit,
    "mann_whitney_rank_test": q_mann_whitney_rank_test,
    "ks_one_vs_rest": q_ks_one_vs_rest,
    "twap_user_value": q_twap_user_value,
    "poisson_bootstrap_ci": q_poisson_bootstrap_ci,
    "spearman_corr_grouped": q_spearman_corr_grouped,
    "isotonic_calibration": q_isotonic_calibration,
    "dp_noisy_counts": q_dp_noisy_counts,
    "roc_auc_by_source": q_roc_auc_by_source,
    "sax_daily_motifs": q_sax_daily_motifs,
    "discrete_hazard_curve": q_discrete_hazard_curve,
    "fd_violation_audit": q_fd_violation_audit,
    "mutual_information_matrix": q_mutual_information_matrix,
    "kendall_tau_daily": q_kendall_tau_daily,
    "jl_projection_audit": q_jl_projection_audit,
    "conformal_interval_calibration": q_conformal_interval_calibration,
    "feature_hash_collision_audit": q_feature_hash_collision_audit,
    "ngram_novelty_rate": q_ngram_novelty_rate,
    "wasserstein_one_vs_rest": q_wasserstein_one_vs_rest,
    "source_ablation_audit": q_source_ablation_audit,
    "anova_f_oneway": q_anova_f_oneway,
    "levene_variance_test": q_levene_variance_test,
    "srm_check": q_srm_check,
    "pinball_loss_eval": q_pinball_loss_eval,
    "median_ci_binomial": q_median_ci_binomial,
    "intrinsic_dim_twonn": q_intrinsic_dim_twonn,
    "ann_ndcg_eval": q_ann_ndcg_eval,
    "mase_seasonal_naive": q_mase_seasonal_naive,
    "weighted_median_exact": q_weighted_median_exact,
    "bloom_fp_rate_audit": q_bloom_fp_rate_audit,
    "hurst_exponent": q_hurst_exponent,
    "abtest_cuped": q_abtest_cuped,
    "partial_corr_audit": q_partial_corr_audit,
    "ols_multifeature_grouped": q_ols_multifeature_grouped,
    "logreg_newton": q_logreg_newton,
    "pca_power_iteration": q_pca_power_iteration,
    "markov_stationary_mix": q_markov_stationary_mix,
    "negbin_overdispersion_fit": q_negbin_overdispersion_fit,
    "pareto_topk_share": q_pareto_topk_share,
    "gpd_tail_fit": q_gpd_tail_fit,
    "decision_stump_split": q_decision_stump_split,
    "bigram_entropy_rate": q_bigram_entropy_rate,
    "theil_index_decomposition": q_theil_index_decomposition,
    # round-9 additions (register BELOW the stamp window; rotate into
    # the r10 window per the standing convention)
    "bpe_merge_learning": q_bpe_merge_learning,
    "line_quality_filter": q_line_quality_filter,
    "url_domain_dedup": q_url_domain_dedup,
    "line_dedup_exact": q_line_dedup_exact,
    "kn_bigram_perplexity": q_kn_bigram_perplexity,
    "unigram_lm_learning": q_unigram_lm_learning,
    "exact_substr_dedup": q_exact_substr_dedup,
    "nb_quality_classifier": q_nb_quality_classifier,
    "nb_calibration_audit": q_nb_calibration_audit,
    "quality_budget_mix": q_quality_budget_mix,
    "nb_holdout_eval": q_nb_holdout_eval,
    "k_anonymity_audit": q_k_anonymity_audit,
    "pr_auc_by_source": q_pr_auc_by_source,
    "logreg_hash_text": q_logreg_hash_text,
    "exact_substr_incremental": q_exact_substr_incremental,
    "temperature_sampling_weights": q_temperature_sampling_weights,
    "dedup_bcubed_eval": q_dedup_bcubed_eval,
    "heaps_law_fit": q_heaps_law_fit,
    "data_constrained_effective_tokens": q_data_constrained_effective_tokens,
    "shard_balance_audit": q_shard_balance_audit,
    "dedup_cluster_cohesion": q_dedup_cluster_cohesion,
    "rare_token_audit": q_rare_token_audit,
    "t_closeness_audit": q_t_closeness_audit,
    "qlm_dirichlet_search": q_qlm_dirichlet_search,
    "doremi_domain_weights": q_doremi_domain_weights,
    "label_propagation_communities": q_label_propagation_communities,
    "kcenter_coreset": q_kcenter_coreset,
    "fellegi_sunter_linkage": q_fellegi_sunter_linkage,
    "unimax_budget_allocation": q_unimax_budget_allocation,
    "packing_truncation_audit": q_packing_truncation_audit,
    "coverage_greedy_selection": q_coverage_greedy_selection,
    "wordpiece_learning": q_wordpiece_learning,
    "grid_density_clusters": q_grid_density_clusters,
    "tokenizer_compare_audit": q_tokenizer_compare_audit,
    "burrows_delta_stylometry": q_burrows_delta_stylometry,
    "dunning_g2_keyness": q_dunning_g2_keyness,
    "jsd_source_divergence": q_jsd_source_divergence,
    "rbo_rank_agreement": q_rbo_rank_agreement,
    "adamic_adar_linkpred": q_adamic_adar_linkpred,
    "degree_distribution_audit": q_degree_distribution_audit,
    "rrf_fusion_topk": q_rrf_fusion_topk,
    "association_rules_lift": q_association_rules_lift,
    "seasonal_decomposition_audit": q_seasonal_decomposition_audit,
    "streaming_near_dup": q_streaming_near_dup,
    "crosslingual_dedup": q_crosslingual_dedup,
    "crosslingual_mate_retrieval": q_crosslingual_mate_retrieval,
    "streaming_near_dup_compaction": q_streaming_near_dup_compaction,
}


# ---------------------------------------------------------------------------
# degenerate (empty-input) contract — r12 empty-input sweep
# ---------------------------------------------------------------------------

#: Queries whose driver-side pre-pass (seed vector, domain bounds,
#: corpus totals) needs at least one input row. Found by running every
#: registry entry against a warehouse of empty tables
#: (scripts/empty_input_sweep.py). Value = the output schema to mirror
#: when the ORACLE returns an empty result on empty input (top-k over
#: nothing, GROUP BY over nothing — names are what the hash compare
#: needs at zero rows); None = the oracle materializes constant rows
#: from scalar subqueries, and the contract is the NAMED
#: :class:`EmptyInputError` instead of an accidental TypeError.
_DEGENERATE_EMPTY: dict[str, str | None] = {
    "abtest_cuped": (
        "arm string, n_users bigint, mean_y double, mean_y_cuped double,"
        " var_reduction double"
    ),
    "ann_index_balance_audit": (
        "list_id int, n_vectors bigint, share double, load_factor double"
    ),
    "ann_ivf_topk": "vec_id bigint, cosine_sim double",
    "ann_sq8_topk": "vec_id bigint, cosine_sim double",
    "ann_ivfpq_topk": "vec_id bigint, pq_dist double",
    "ann_lsh_indexed": "vec_id bigint, cosine_sim double",
    "ann_lsh_topk": "vec_id bigint, cosine_sim double",
    "ann_pq_topk": "vec_id bigint, pq_dist double",
    "benford_digit_audit": (
        "digit int, n bigint, share double, benford_share double,"
        " chi2_contrib double"
    ),
    "bm25_search": "doc_id bigint, bm25 double",
    "decision_stump_split": (
        "n_docs bigint, n_pos bigint, best_split_n_chars bigint,"
        " gini_gain double, gini_parent double"
    ),
    "discrete_hazard_curve": (
        "age_days bigint, n_churned bigint, n_at_risk bigint, hazard double"
    ),
    "doc_topic_clusters": "list_id int, n_docs bigint, id_checksum bigint",
    "dow_seasonality": (
        "dow int, n_orders bigint, revenue double, dow_index double"
    ),
    "dsir_importance_weights": (
        "doc_id bigint, n_tokens bigint, dsir_weight double"
    ),
    "epoch_mixture_sample": (
        "source string, n_docs bigint, permille bigint, n_kept bigint,"
        " kept_id_checksum bigint"
    ),
    "events_time_pruned": "day date, n_events bigint, sum_value double",
    "knn_bruteforce": "vec_id bigint, cosine_sim double",
    "logreg_hash_text": (
        "split string, n_docs bigint, n_pos bigint, accuracy double,"
        " log_loss double, beta0 double, beta1_h0 double, beta2_h1 double"
    ),
    "mad_outliers": (
        "event_type string, n_events bigint, n_outliers bigint,"
        " median_value double, mad_value double"
    ),
    "mann_whitney_rank_test": (
        "event_type string, n1 bigint, u_stat double, z_score double"
    ),
    "markov_stationary_mix": (
        "event_type string, n_events bigint, empirical_mix double,"
        " stationary_mix double"
    ),
    "mink_prob_contamination": (
        "doc_id bigint, n_tokens bigint, k_tokens bigint, mink_score double"
    ),
    "psi_drift": "band int, n_old bigint, n_new bigint, psi_contrib double",
    "rfm_segments": (
        "r_q int, f_q int, m_q int, n_users bigint, seg_mon_c bigint"
    ),
    "rrf_fusion_topk": (
        "doc_id bigint, bm25_rank int, qlm_rank int, rrf_score double"
    ),
    "skyline_orders": "price double, order_day int",
    "theil_index_decomposition": (
        "seg string, n_g bigint, t_contribution double, t_between double,"
        " t_within_scaled double"
    ),
    "theil_sen_trend": (
        "n_days bigint, n_pairs bigint, sen_slope_per_day double"
    ),
    "unigram_kl_divergence": (
        "source string, n_tokens bigint, kl_vs_corpus double"
    ),
    "woe_binning": (
        "band int, n_good bigint, n_bad bigint, woe double, iv_contrib double"
    ),
    # oracle materializes constant rows → named error, not a mirror
    "ann_ndcg_eval": None,
    "ann_recall_audit": None,
    "equi_depth_histogram": None,
    "frag_pruning_report": None,
    "funnel_time_to_convert": None,
    "gini_concentration": None,
    "gpd_tail_fit": None,
    "lineitem_zorder_skip": None,
    "logreg_newton": None,
    "pareto_topk_share": None,
    "rbo_rank_agreement": None,
    "streaming_louter_attribution": None,
    "tokenizer_compare_audit": None,
}

#: fact tables whose joint emptiness defines the degenerate world; the
#: guard only translates an exception when ALL of them are empty (a
#: partially-empty warehouse keeps the raw exception — uncontracted)
_DEGENERATE_FACTS = (
    "documents",
    "embeddings",
    "events",
    "orders",
    "lineitem",
    "customer",
)


def _all_facts_empty(spark: SparkSession, sf_dir: str) -> bool:
    try:
        return all(
            _t(spark, sf_dir, t).limit(1).head() is None
            for t in _DEGENERATE_FACTS
        )
    except Exception:
        return False


def _degenerate_guard(name: str, fn, schema: str | None):
    """Exception-path-only empty-input contract: the happy path is the
    original builder untouched (no extra jobs); when the builder's
    driver-side pre-pass trips over an empty corpus (TypeError off a
    None row, IndexError off an empty collect, a schema-inference
    ValueError), verify the warehouse really is empty and then either
    mirror the oracle's empty result or raise the named error."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        try:
            return fn(spark, sf_dir)
        except (TypeError, IndexError, KeyError, ValueError) as exc:
            if isinstance(exc, EmptyInputError):
                raise
            if not _all_facts_empty(spark, sf_dir):
                raise
            if schema is None:
                raise EmptyInputError(
                    f"{name}: input tables are empty — this query's "
                    f"output is derived from driver-side pre-pass "
                    f"scalars that need at least one row"
                ) from exc
            return _empty_result(spark, schema)

    return wrapped


for _n, _s in _DEGENERATE_EMPTY.items():
    _QUERIES_ALL[_n] = _degenerate_guard(_n, _QUERIES_ALL[_n], _s)

_ORACLE_SQL_ALL: dict[str, str] = {
    "frag_insert_routing": SQL_FRAG_INSERT_ROUTING,
    "frag_range_counts": SQL_FRAG_RANGE_COUNTS,
    "frag_rr_counts": SQL_FRAG_RR_COUNTS,
    "frag_range_query": SQL_FRAG_RANGE_QUERY,
    "frag_point_query": SQL_FRAG_POINT_QUERY,
    "frag_reconstruction": SQL_FRAG_RECONSTRUCTION,
    "q1_pricing_summary": SQL_Q1,
    "q3_top_revenue_orders": SQL_Q3,
    "q5_region_nation_revenue": SQL_Q5,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "customers_with_open_orders": SQL_CUSTOMERS_WITH_OPEN_ORDERS,
    "top_order_per_customer": SQL_TOP_ORDER_PER_CUSTOMER,
    "sales_rollup": SQL_SALES_ROLLUP,
    "orders_cube": SQL_ORDERS_CUBE,
    "distinct_parts_per_flag": SQL_DISTINCT_PARTS_PER_FLAG,
    "events_json_kpis": SQL_EVENTS_JSON_KPIS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "top_event_per_user": SQL_TOP_EVENT_PER_USER,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "dedup_exact_groups": SQL_DEDUP_EXACT_GROUPS,
    "lang_id_confusion": SQL_LANG_ID_CONFUSION,
    "quality_by_source": SQL_QUALITY_BY_SOURCE,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "minhash_near_dup_pairs": SQL_MINHASH_NEAR_DUP_PAIRS,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "simhash_signatures": SQL_SIMHASH_SIGNATURES,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_lsh_indexed": SQL_ANN_LSH_TOPK,  # result-identical by design
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "sessionization": SQL_SESSIONIZATION,
    "asof_click_attribution": SQL_ASOF_CLICK_ATTRIBUTION,
    "range_join_price_bands": SQL_RANGE_JOIN_PRICE_BANDS,
    "streaming_hourly": SQL_STREAMING_HOURLY,
    "q6_forecast_revenue": SQL_Q6,
    "q4_priority_returns": SQL_Q4,
    "q17_small_qty_revenue": SQL_Q17,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "bpe_token_stats": SQL_BPE_TOKEN_STATS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "events_sliding_windows": SQL_EVENTS_SLIDING_WINDOWS,
    "session_windows": SQL_SESSION_WINDOWS,
    "events_value_quantiles": SQL_EVENTS_VALUE_QUANTILES,
    "user_setops": SQL_USER_SETOPS,
    "events_pivot": SQL_EVENTS_PIVOT,
    "grouping_sets": SQL_GROUPING_SETS,
    "scalar_functions": SQL_SCALAR_FUNCTIONS,
    "array_functions": SQL_ARRAY_FUNCTIONS,
    "q19_disjunctive_revenue": SQL_Q19,
    "q10_returned_revenue": SQL_Q10,
    "rollup_cascade_daily": SQL_ROLLUP_CASCADE_DAILY,
    "event_funnel": SQL_EVENT_FUNNEL,
    "simhash_near_dup_pairs": SQL_SIMHASH_NEAR_DUP_PAIRS,
    "q18_large_volume_customers": SQL_Q18,
    "user_rolling_avg": SQL_USER_ROLLING_AVG,
    "event_gaps": SQL_EVENT_GAPS,
    "q12_priority_line_counts": SQL_Q12,
    "q13_order_count_distribution": SQL_Q13,
    "q14_promo_revenue_ratio": SQL_Q14,
    "q22_dormant_high_balance": SQL_Q22,
    "doc_sample_stratified": SQL_DOC_SAMPLE_STRATIFIED,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "orders_merge_upsert": SQL_ORDERS_MERGE_UPSERT,
    "q7_nation_trade_flows": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q11_important_parts": SQL_Q11,
    "q15_top_suppliers": SQL_Q15,
    "q16_supplier_variety": SQL_Q16,
    "q2_min_cost_supplier": SQL_Q2,
    "q9_nation_profit": SQL_Q9,
    "q20_excess_suppliers": SQL_Q20,
    "q21_waiting_suppliers": SQL_Q21,
    "streaming_enriched": SQL_STREAMING_ENRICHED,
    "dedup_clusters": _sql_dedup_clusters(),
    "contamination_pairs": SQL_CONTAMINATION_PAIRS,
    "doc_repetition": SQL_DOC_REPETITION,
    "token_histogram": SQL_TOKEN_HISTOGRAM,
    "fuzzy_name_pairs": SQL_FUZZY_NAME_PAIRS,
    "events_gap_fill": SQL_EVENTS_GAP_FILL,
    "customer_window_battery": SQL_CUSTOMER_WINDOW_BATTERY,
    "lineitem_unpivot": SQL_LINEITEM_UNPIVOT,
    "scd2_order_history": SQL_SCD2_ORDER_HISTORY,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "multimodal_real_resize": SQL_MULTIMODAL_REAL_RESIZE,
    "multimodal_real_audio": SQL_MULTIMODAL_REAL_AUDIO,
    "multimodal_real_frames": SQL_MULTIMODAL_REAL_FRAMES,
    "ann_index_balance_audit": SQL_ANN_INDEX_BALANCE_AUDIT,
    "ann_sq8_topk": SQL_ANN_SQ8_TOPK,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "term_masking": SQL_TERM_MASKING,
    "data_profile": SQL_DATA_PROFILE,
    "mcv_stats_audit": SQL_MCV_STATS_AUDIT,
    "heavy_hitters_salted": SQL_HEAVY_HITTERS_SALTED,
    "user_zscore_outliers": SQL_USER_ZSCORE_OUTLIERS,
    "value_regression": SQL_VALUE_REGRESSION,
    "streaming_dedup": SQL_STREAMING_DEDUP,
    "quality_gate_funnel": SQL_QUALITY_GATE_FUNNEL,
    "bloom_pruned_revenue": SQL_BLOOM_PRUNED_REVENUE,
    "incremental_rollup": SQL_INCREMENTAL_ROLLUP,
    "dedup_keep_canonical": SQL_DEDUP_KEEP_CANONICAL,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "join_null_semantics": SQL_JOIN_NULL_SEMANTICS,
    "trimmed_mean_per_segment": SQL_TRIMMED_MEAN_PER_SEGMENT,
    "streaming_attribution": SQL_STREAMING_ATTRIBUTION,
    "bool_agg_battery": SQL_BOOL_AGG_BATTERY,
    "string_agg_battery": SQL_STRING_AGG_BATTERY,
    "regex_battery": SQL_REGEX_BATTERY,
    "datetime_battery": SQL_DATETIME_BATTERY,
    "conditional_null_battery": SQL_CONDITIONAL_NULL_BATTERY,
    "frag_rebalance": SQL_FRAG_REBALANCE,
    "frag_skew_report": SQL_FRAG_SKEW_REPORT,
    "embedding_quantization": SQL_EMBEDDING_QUANTIZATION,
    "mixture_weights": SQL_MIXTURE_WEIGHTS,
    "stopword_discovery": SQL_STOPWORD_DISCOVERY,
    "near_dup_audit": SQL_NEAR_DUP_AUDIT,
    "ann_recall_audit": SQL_ANN_RECALL_AUDIT,
    "frag_hash_counts": SQL_FRAG_HASH_COUNTS,
    "frag_consistent_hash_ring": SQL_FRAG_CONSISTENT_HASH_RING,
    "frame_semantics_battery": SQL_FRAME_SEMANTICS_BATTERY,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "sequence_packing_audit": SQL_SEQUENCE_PACKING_AUDIT,
    "doc_sample_weighted": SQL_DOC_SAMPLE_WEIGHTED,
    "benchmark_decontamination": SQL_BENCHMARK_DECONTAMINATION,
    "incremental_near_dup": SQL_INCREMENTAL_NEAR_DUP,
    "orders_cdc_apply": SQL_ORDERS_CDC_APPLY,
    "events_variant_kpis": SQL_EVENTS_VARIANT_KPIS,
    "user_growth": SQL_USER_GROWTH,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "events_time_pruned": SQL_EVENTS_TIME_PRUNED,
    "lineitem_zorder_skip": SQL_LINEITEM_ZORDER_SKIP,
    "approx_distinct_users": SQL_APPROX_DISTINCT_USERS,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "doc_char_entropy": SQL_DOC_CHAR_ENTROPY,
    "pmi_collocations": SQL_PMI_COLLOCATIONS,
    "pii_redaction": SQL_PII_REDACTION,
    "bucketed_join_revenue": SQL_BUCKETED_JOIN_REVENUE,
    "streaming_sessionization": SQL_STREAMING_SESSIONIZATION,
    "streaming_upsert_latest": SQL_STREAMING_UPSERT_LATEST,
    "csv_quarantine_audit": SQL_CSV_QUARANTINE_AUDIT,
    "salted_join_segments": SQL_SALTED_JOIN_SEGMENTS,
    "jsonl_quarantine_audit": SQL_JSONL_QUARANTINE_AUDIT,
    "doc_lm_perplexity": SQL_DOC_LM_PERPLEXITY,
    "doc_split_assign": SQL_DOC_SPLIT_ASSIGN,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "gdpr_delete_audit": SQL_GDPR_DELETE_AUDIT,
    "ewma_user_value": SQL_EWMA_USER_VALUE,
    "vocab_oov_rate": SQL_VOCAB_OOV_RATE,
    "boilerplate_chunk_removal": SQL_BOILERPLATE_CHUNK_REMOVAL,
    "bow_dedup": SQL_BOW_DEDUP,
    "orc_roundtrip_agg": SQL_ORC_ROUNDTRIP_AGG,
    "schema_evolution_read": SQL_SCHEMA_EVOLUTION_READ,
    "pagerank_copurchase": _pagerank_sql(),
    "triangle_count_copurchase": SQL_TRIANGLE_COUNT_COPURCHASE,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "binaryfile_ingest": SQL_BINARYFILE_INGEST,
    "session_overlap_pairs": SQL_SESSION_OVERLAP_PAIRS,
    "chi_square_lang_source": SQL_CHI_SQUARE_LANG_SOURCE,
    "approx_quantile_audit": SQL_APPROX_QUANTILE_AUDIT,
    "streaming_topk_trending": SQL_STREAMING_TOPK_TRENDING,
    "split_leakage_audit": SQL_SPLIT_LEAKAGE_AUDIT,
    "dup_flow_matrix": _sql_dup_flow_matrix(),
    "streaming_louter_attribution": SQL_STREAMING_LOUTER_ATTRIBUTION,
    "group_topk_sample": SQL_GROUP_TOPK_SAMPLE,
    "hof_battery": SQL_HOF_BATTERY,
    "setops_all_battery": SQL_SETOPS_ALL_BATTERY,
    "null_ordering_battery": SQL_NULL_ORDERING_BATTERY,
    "rag_chunking": SQL_RAG_CHUNKING,
    "quote_detection": SQL_QUOTE_DETECTION,
    "windowed_distinct_users": SQL_WINDOWED_DISTINCT_USERS,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "streaming_cdc_apply": SQL_STREAMING_CDC_APPLY,
    "skyline_orders": SQL_SKYLINE_ORDERS,
    "doc_topic_clusters": SQL_DOC_TOPIC_CLUSTERS,
    "cms_join_estimate": SQL_CMS_JOIN_ESTIMATE,
    "equi_depth_histogram": _sql_equi_depth(),
    "sql_interface_q1": SQL_Q1,  # the same text runs on both engines
    "multimodal_audio_windows": SQL_MULTIMODAL_AUDIO_WINDOWS,
    "eval_set_builder": SQL_EVAL_SET_BUILDER,
    "xml_roundtrip_agg": SQL_XML_ROUNDTRIP_AGG,
    "quantile_disc_battery": SQL_QUANTILE_DISC_BATTERY,
    "ignore_nulls_window_battery": SQL_IGNORE_NULLS_WINDOW_BATTERY,
    "grouping_flags_battery": SQL_GROUPING_FLAGS_BATTERY,
    "lateral_ordinality_battery": SQL_LATERAL_ORDINALITY_BATTERY,
    "signed_divmod_battery": SQL_SIGNED_DIVMOD_BATTERY,
    "ab_test_zscore": SQL_AB_TEST_ZSCORE,
    "sprt_ab_monitor": SQL_SPRT_AB_MONITOR,
    "funnel_time_to_convert": SQL_FUNNEL_TIME_TO_CONVERT,
    "event_transition_matrix": SQL_EVENT_TRANSITION_MATRIX,
    "user_path_topk": SQL_USER_PATH_TOPK,
    "winnowing_span_matches": SQL_WINNOWING_SPAN_MATCHES,
    "embedding_dim_variance": SQL_EMBEDDING_DIM_VARIANCE,
    "domain_soft_cap": SQL_DOMAIN_SOFT_CAP,
    "dsir_importance_weights": SQL_DSIR_IMPORTANCE_WEIGHTS,
    "gopher_quality_flags": SQL_GOPHER_QUALITY_FLAGS,
    "dup_span_coverage": SQL_DUP_SPAN_COVERAGE,
    "kmv_set_similarity": SQL_KMV_SET_SIMILARITY,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "sorted_neighborhood_pairs": SQL_SORTED_NEIGHBORHOOD_PAIRS,
    "bitwise_battery": SQL_BITWISE_BATTERY,
    "embedding_covariance_topk": SQL_EMBEDDING_COVARIANCE_TOPK,
    "map_functions_battery": SQL_MAP_FUNCTIONS_BATTERY,
    "struct_order_battery": SQL_STRUCT_ORDER_BATTERY,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "hierarchy_rollup": SQL_HIERARCHY_ROLLUP,
    "zipf_slope": SQL_ZIPF_SLOPE,
    "readability_scores": SQL_READABILITY_SCORES,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "term_burstiness": SQL_TERM_BURSTINESS,
    "bm25_search": SQL_BM25_SEARCH,
    "phrase_search_positional": SQL_PHRASE_SEARCH_POSITIONAL,
    "bitmap_index_intersection": SQL_BITMAP_INDEX_INTERSECTION,
    "neyman_allocation_audit": SQL_NEYMAN_ALLOCATION_AUDIT,
    "soft_dedup_weights": SQL_SOFT_DEDUP_WEIGHTS,
    "referential_integrity_audit": SQL_REFERENTIAL_INTEGRITY_AUDIT,
    "item_cooccurrence_topk": SQL_ITEM_COOCCURRENCE_TOPK,
    "woe_binning": SQL_WOE_BINNING,
    "grouped_mode": SQL_GROUPED_MODE,
    "benford_digit_audit": SQL_BENFORD_DIGIT_AUDIT,
    "revenue_autocorr": SQL_REVENUE_AUTOCORR,
    "dow_seasonality": SQL_DOW_SEASONALITY,
    "gini_concentration": SQL_GINI_CONCENTRATION,
    "unigram_kl_divergence": SQL_UNIGRAM_KL_DIVERGENCE,
    "rank_functions_battery": SQL_RANK_FUNCTIONS_BATTERY,
    "ann_pq_topk": SQL_ANN_PQ_TOPK,
    "psi_drift": SQL_PSI_DRIFT,
    "ppl_tercile_buckets": SQL_PPL_TERCILE_BUCKETS,
    "suffix_prefix_overlap_pairs": SQL_SUFFIX_PREFIX_OVERLAP_PAIRS,
    "domain_mix_entropy": SQL_DOMAIN_MIX_ENTROPY,
    "ann_ivfpq_topk": SQL_ANN_IVFPQ_TOPK,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "dedup_cluster_histogram": _sql_dedup_cluster_histogram(),
    "tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "frag_pruning_report": _sql_frag_pruning_report(),
    "epoch_mixture_sample": SQL_EPOCH_MIXTURE_SAMPLE,
    "embedding_norm_audit": SQL_EMBEDDING_NORM_AUDIT,
    "lsh_banding_curve": _sql_lsh_banding_curve(),
    "copurchase_bfs_hops": _sql_copurchase_bfs_hops(),
    "mink_prob_contamination": SQL_MINK_PROB_CONTAMINATION,
    "theil_sen_trend": SQL_THEIL_SEN_TREND,
    "hard_negative_mining": _sql_hard_negative_mining(),
    "quantile_normalize_audit": SQL_QUANTILE_NORMALIZE_AUDIT,
    "mann_whitney_rank_test": SQL_MANN_WHITNEY_RANK_TEST,
    "ks_one_vs_rest": SQL_KS_ONE_VS_REST,
    "twap_user_value": SQL_TWAP_USER_VALUE,
    "poisson_bootstrap_ci": _sql_poisson_bootstrap_ci(),
    "spearman_corr_grouped": SQL_SPEARMAN_CORR_GROUPED,
    "isotonic_calibration": SQL_ISOTONIC_CALIBRATION,
    "dp_noisy_counts": SQL_DP_NOISY_COUNTS,
    "roc_auc_by_source": SQL_ROC_AUC_BY_SOURCE,
    "sax_daily_motifs": SQL_SAX_DAILY_MOTIFS,
    "discrete_hazard_curve": SQL_DISCRETE_HAZARD_CURVE,
    "fd_violation_audit": SQL_FD_VIOLATION_AUDIT,
    "mutual_information_matrix": SQL_MUTUAL_INFORMATION_MATRIX,
    "kendall_tau_daily": SQL_KENDALL_TAU_DAILY,
    "jl_projection_audit": _sql_jl_projection_audit(),
    "conformal_interval_calibration": SQL_CONFORMAL_INTERVAL_CALIBRATION,
    "feature_hash_collision_audit": SQL_FEATURE_HASH_COLLISION_AUDIT,
    "ngram_novelty_rate": SQL_NGRAM_NOVELTY_RATE,
    "wasserstein_one_vs_rest": SQL_WASSERSTEIN_ONE_VS_REST,
    "source_ablation_audit": SQL_SOURCE_ABLATION_AUDIT,
    "anova_f_oneway": SQL_ANOVA_F_ONEWAY,
    "levene_variance_test": SQL_LEVENE_VARIANCE_TEST,
    "srm_check": SQL_SRM_CHECK,
    "pinball_loss_eval": SQL_PINBALL_LOSS_EVAL,
    "median_ci_binomial": SQL_MEDIAN_CI_BINOMIAL,
    "intrinsic_dim_twonn": _sql_intrinsic_dim_twonn(),
    "ann_ndcg_eval": _sql_ann_ndcg_eval(),
    "mase_seasonal_naive": SQL_MASE_SEASONAL_NAIVE,
    "weighted_median_exact": SQL_WEIGHTED_MEDIAN_EXACT,
    "bloom_fp_rate_audit": _sql_bloom_fp_rate_audit(),
    "hurst_exponent": _sql_hurst_exponent(),
    "abtest_cuped": SQL_ABTEST_CUPED,
    "partial_corr_audit": _sql_partial_corr_audit(),
    "ols_multifeature_grouped": _sql_ols_multifeature_grouped(),
    "logreg_newton": _sql_logreg_newton(),
    "pca_power_iteration": _sql_pca_power_iteration(),
    "markov_stationary_mix": _sql_markov_stationary_mix(),
    "negbin_overdispersion_fit": SQL_NEGBIN_OVERDISPERSION_FIT,
    "pareto_topk_share": SQL_PARETO_TOPK_SHARE,
    "gpd_tail_fit": SQL_GPD_TAIL_FIT,
    "decision_stump_split": SQL_DECISION_STUMP_SPLIT,
    "bigram_entropy_rate": SQL_BIGRAM_ENTROPY_RATE,
    "theil_index_decomposition": SQL_THEIL_INDEX_DECOMPOSITION,
    "bpe_merge_learning": SQL_BPE_MERGE_LEARNING,
    "line_quality_filter": SQL_LINE_QUALITY_FILTER,
    "url_domain_dedup": SQL_URL_DOMAIN_DEDUP,
    "line_dedup_exact": SQL_LINE_DEDUP_EXACT,
    "kn_bigram_perplexity": SQL_KN_BIGRAM_PERPLEXITY,
    "unigram_lm_learning": SQL_UNIGRAM_LM_LEARNING,
    "exact_substr_dedup": SQL_EXACT_SUBSTR_DEDUP,
    "nb_quality_classifier": SQL_NB_QUALITY_CLASSIFIER,
    "nb_calibration_audit": SQL_NB_CALIBRATION_AUDIT,
    "quality_budget_mix": SQL_QUALITY_BUDGET_MIX,
    "nb_holdout_eval": SQL_NB_HOLDOUT_EVAL,
    "k_anonymity_audit": SQL_K_ANONYMITY_AUDIT,
    "pr_auc_by_source": SQL_PR_AUC_BY_SOURCE,
    "logreg_hash_text": SQL_LOGREG_HASH_TEXT,
    "exact_substr_incremental": SQL_EXACT_SUBSTR_INCREMENTAL,
    "temperature_sampling_weights": SQL_TEMPERATURE_SAMPLING_WEIGHTS,
    "dedup_bcubed_eval": SQL_DEDUP_BCUBED_EVAL,
    "heaps_law_fit": SQL_HEAPS_LAW_FIT,
    "data_constrained_effective_tokens": SQL_DATA_CONSTRAINED_EFFECTIVE_TOKENS,
    "shard_balance_audit": SQL_SHARD_BALANCE_AUDIT,
    "dedup_cluster_cohesion": SQL_DEDUP_CLUSTER_COHESION,
    "rare_token_audit": SQL_RARE_TOKEN_AUDIT,
    "t_closeness_audit": SQL_T_CLOSENESS_AUDIT,
    "qlm_dirichlet_search": SQL_QLM_DIRICHLET_SEARCH,
    "doremi_domain_weights": SQL_DOREMI_DOMAIN_WEIGHTS,
    "label_propagation_communities": SQL_LABEL_PROPAGATION_COMMUNITIES,
    "kcenter_coreset": SQL_KCENTER_CORESET,
    "fellegi_sunter_linkage": SQL_FELLEGI_SUNTER_LINKAGE,
    "unimax_budget_allocation": SQL_UNIMAX_BUDGET_ALLOCATION,
    "packing_truncation_audit": SQL_PACKING_TRUNCATION_AUDIT,
    "coverage_greedy_selection": SQL_COVERAGE_GREEDY_SELECTION,
    "wordpiece_learning": SQL_WORDPIECE_LEARNING,
    "grid_density_clusters": SQL_GRID_DENSITY_CLUSTERS,
    "tokenizer_compare_audit": SQL_TOKENIZER_COMPARE_AUDIT,
    "burrows_delta_stylometry": SQL_BURROWS_DELTA_STYLOMETRY,
    "dunning_g2_keyness": SQL_DUNNING_G2_KEYNESS,
    "jsd_source_divergence": SQL_JSD_SOURCE_DIVERGENCE,
    "rbo_rank_agreement": SQL_RBO_RANK_AGREEMENT,
    "adamic_adar_linkpred": SQL_ADAMIC_ADAR_LINKPRED,
    "degree_distribution_audit": SQL_DEGREE_DISTRIBUTION_AUDIT,
    "rrf_fusion_topk": SQL_RRF_FUSION_TOPK,
    "association_rules_lift": SQL_ASSOCIATION_RULES_LIFT,
    "seasonal_decomposition_audit": SQL_SEASONAL_DECOMPOSITION_AUDIT,
    "streaming_near_dup": SQL_STREAMING_NEAR_DUP,
    "crosslingual_dedup": _xl_sql(),
    "crosslingual_mate_retrieval": _xl_mate_sql(),
    # compaction is lossless by contract: the post-compaction pair set
    # equals streaming_near_dup's, so it shares the oracle
    "streaming_near_dup_compaction": SQL_STREAMING_NEAR_DUP,
}


#: Round-5 driver stamp window (the driver runs the FIRST 50 registry
#: entries each round). Per the round-4 verdict: 5 slots pinned to the
#: reference fragmentation surface (including the brand-new
#: frag_insert_routing, closing §2.1 ops #5/#6's driver-evidence gap),
#: the other 45 filled with queries that have NEVER had a driver
#: correctness row in rounds 1-4. Surface growth is frozen this round
#: (frag_insert_routing is the only addition, mandated by the verdict),
#: so after r05 only 6 queries remain unstamped — the six SQL-function
#: batteries below, all individually oracle-verified by
#: tests/test_oracle_queries.py and scheduled for the r06 window:
#: hof_battery, setops_all_battery, null_ordering_battery,
#: ignore_nulls_window_battery, grouping_flags_battery,
#: lateral_ordinality_battery.
_R5_WINDOW: list[str] = [
    # pinned reference surface
    "frag_range_counts",
    "frag_rr_counts",
    "frag_range_query",
    "frag_point_query",
    "frag_insert_routing",
    # never-driver-stamped, rounds 1-4 (45)
    "streaming_sessionization",
    "streaming_upsert_latest",
    "streaming_cdc_apply",
    "streaming_topk_trending",
    "streaming_louter_attribution",
    "windowed_distinct_users",
    "csv_quarantine_audit",
    "jsonl_quarantine_audit",
    "salted_join_segments",
    "doc_lm_perplexity",
    "doc_split_assign",
    "cms_heavy_hitters",
    "snapshot_diff",
    "gdpr_delete_audit",
    "ewma_user_value",
    "vocab_oov_rate",
    "boilerplate_chunk_removal",
    "bow_dedup",
    "orc_roundtrip_agg",
    "schema_evolution_read",
    "pagerank_copurchase",
    "triangle_count_copurchase",
    "semantic_dedup",
    "binaryfile_ingest",
    "session_overlap_pairs",
    "chi_square_lang_source",
    "approx_quantile_audit",
    "split_leakage_audit",
    "dup_flow_matrix",
    "group_topk_sample",
    "rag_chunking",
    "quote_detection",
    "mad_outliers",
    "skyline_orders",
    "doc_topic_clusters",
    "cms_join_estimate",
    "equi_depth_histogram",
    "sql_interface_q1",
    "multimodal_audio_windows",
    "eval_set_builder",
    "xml_roundtrip_agg",
    "quantile_disc_battery",
    "signed_divmod_battery",
    "ab_test_zscore",
    "funnel_time_to_convert",
]

#: The six batteries that were never driver-stamped through round 5,
#: promoted into the round-6 window (positions 6-11) to close the
#: evidence gap: after r06 every registered query has a driver
#: correctness row.
_R6_NEXT: list[str] = [
    "hof_battery",
    "setops_all_battery",
    "null_ordering_battery",
    "ignore_nulls_window_battery",
    "grouping_flags_battery",
    "lateral_ordinality_battery",
]

#: Queries whose IMPLEMENTATION changed in round 6 and therefore need a
#: fresh driver stamp on the new code path:
#:  - percentile consolidation onto the bounded-state selectors in
#:    operators/stats.py (events_value_quantiles, approx_quantile_audit,
#:    mad_outliers, quantile_disc_battery, funnel_time_to_convert)
#:  - bounded exact ground truth for the near-dup recall audit
#:    (near_dup_audit) and the shared-index rework (incremental_near_dup)
#:  - the Hadoop-FileSystem commit shim replacing bare POSIX IO
#:    (incremental_rollup, streaming_upsert_latest, streaming_cdc_apply)
#:  - the soft-dep real-decode path (multimodal_resize)
#:  - the perf-flagged line under re-measurement
#:    (streaming_louter_attribution)
_R6_RESTAMP: list[str] = [
    "events_value_quantiles",
    "approx_quantile_audit",
    "mad_outliers",
    "quantile_disc_battery",
    "funnel_time_to_convert",
    "near_dup_audit",
    "incremental_near_dup",
    "incremental_rollup",
    "streaming_upsert_latest",
    "streaming_cdc_apply",
    "multimodal_resize",
    "streaming_louter_attribution",
]

#: Round-6 driver stamp window (the driver stamps the FIRST 50 registry
#: entries). Composition: the 5 pinned reference fragmentation rows,
#: the 6 final never-stamped batteries, the 12 round-6-modified queries
#: above, and a refill of 27 unchanged queries from the round-5 window
#: in its original order (re-stamping the most recently verified
#: surface costs nothing and keeps the window full).
#: Queries ADDED in round 6 (registered below the stamp window; they
#: are oracle-checked locally and rotate into the r7 stamp prefix —
#: the same add-then-rotate lifecycle every post-r1 query followed).
#: ROUND-7 ROTATION PLAN (apply at the START of round 7, never
#: mid-round): keep the 5 frag rows pinned at positions 1-5, place all
#: entries of this list at positions 6-24 (every one is driver-
#: unstamped through r6), add any r7-modified queries for restamps,
#: and refill the remainder of the 50-slot window from the r6 window
#: in its original order.
_R6_ADDED: list[str] = [
    "event_transition_matrix",
    "user_path_topk",
    "winnowing_span_matches",
    "embedding_dim_variance",
    "domain_soft_cap",
    "dsir_importance_weights",
    "gopher_quality_flags",
    "dup_span_coverage",
    "kmv_set_similarity",
    "cusum_changepoint",
    "sorted_neighborhood_pairs",
    "bitwise_battery",
    "embedding_covariance_topk",
    "map_functions_battery",
    "struct_order_battery",
    "rfm_segments",
    "hierarchy_rollup",
    "zipf_slope",
    "readability_scores",
    "lexical_diversity",
    "term_burstiness",
    "bm25_search",
    "referential_integrity_audit",
    "item_cooccurrence_topk",
    "woe_binning",
]

_R6_WINDOW: list[str] = (
    _R5_WINDOW[:5]
    + _R6_NEXT
    + _R6_RESTAMP
    + [
        n
        for n in _R5_WINDOW[5:]
        if n not in set(_R6_RESTAMP)
    ][: 50 - 5 - len(_R6_NEXT) - len(_R6_RESTAMP)]
)

# Window-composition invariants. These are load-bearing (the driver
# stamps by position), so raise explicitly rather than assert — bare
# asserts vanish under ``python -O``.
if len(_R6_WINDOW) != 50 or len(set(_R6_WINDOW)) != 50:
    raise RuntimeError("r6 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R6_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r6 stamp window names unknown queries: {_missing}")

#: Queries whose IMPLEMENTATION changed in round 7 and therefore need a
#: fresh driver stamp on the new code path: the six consumers of the
#: bounded-state percentile selectors (operators/stats.py gained
#: persisted-input bisection + Arrow gathers + the all-gatherable fast
#: path; mad_outliers additionally persists its shared projections).
#: The four other r7-modified queries (item_cooccurrence_topk,
#: sorted_neighborhood_pairs, event_transition_matrix, user_path_topk)
#: are in _R6_ADDED and enter the window through the rotation anyway.
_R7_RESTAMP: list[str] = [
    "events_value_quantiles",
    "approx_quantile_audit",
    "mad_outliers",
    "equi_depth_histogram",
    "quantile_disc_battery",
    "funnel_time_to_convert",
]

#: Queries ADDED in round 7 (registered below the stamp window; they
#: are oracle-checked locally and rotate into the r8 stamp prefix —
#: the same add-then-rotate lifecycle every post-r1 query followed).
#: ROUND-8 ROTATION PLAN (apply at the START of round 8, never
#: mid-round): keep the 5 frag rows pinned at positions 1-5, place all
#: entries of this list next, add any r8-modified queries for restamps,
#: and refill the remainder of the 50-slot window from the r7 window
#: in its original order.
_R7_ADDED: list[str] = [
    "grouped_mode",
    "benford_digit_audit",
    "revenue_autocorr",
    "dow_seasonality",
    "gini_concentration",
    "unigram_kl_divergence",
    "rank_functions_battery",
    "ann_pq_topk",
    "psi_drift",
    "ppl_tercile_buckets",
    "suffix_prefix_overlap_pairs",
    "domain_mix_entropy",
    "ann_ivfpq_topk",
    "containment_pairs",
    "dedup_cluster_histogram",
    "tokenizer_fertility",
    "frag_pruning_report",
    "epoch_mixture_sample",
    "embedding_norm_audit",
    "lsh_banding_curve",
    "copurchase_bfs_hops",
    "mink_prob_contamination",
    "theil_sen_trend",
    "hard_negative_mining",
    "quantile_normalize_audit",
    "mann_whitney_rank_test",
    "ks_one_vs_rest",
    "twap_user_value",
    "poisson_bootstrap_ci",
    "spearman_corr_grouped",
    "isotonic_calibration",
    "dp_noisy_counts",
    "roc_auc_by_source",
    "sax_daily_motifs",
    "discrete_hazard_curve",
    "fd_violation_audit",
    "mutual_information_matrix",
    "kendall_tau_daily",
    "jl_projection_audit",
    "conformal_interval_calibration",
    "feature_hash_collision_audit",
    "ngram_novelty_rate",
    "wasserstein_one_vs_rest",
    "source_ablation_audit",
    "anova_f_oneway",
    "levene_variance_test",
    "srm_check",
    "pinball_loss_eval",
    "median_ci_binomial",
    "intrinsic_dim_twonn",
    "ann_ndcg_eval",
    "mase_seasonal_naive",
    "weighted_median_exact",
    "bloom_fp_rate_audit",
    "hurst_exponent",
    "abtest_cuped",
    "partial_corr_audit",
    "ols_multifeature_grouped",
    "logreg_newton",
    "pca_power_iteration",
    "markov_stationary_mix",
    "negbin_overdispersion_fit",
    "pareto_topk_share",
    "gpd_tail_fit",
    "decision_stump_split",
    "bigram_entropy_rate",
    "theil_index_decomposition",
]

#: Round-7 driver stamp window: the 5 pinned reference fragmentation
#: rows, the 25 round-6 additions (the only registry entries without a
#: driver stamp through r6 — stamping them makes driver coverage
#: 209/209), the 6 round-7-modified queries above, and a refill of 14
#: unchanged queries from the round-6 window in its original order.
_R7_WINDOW: list[str] = (
    _R6_WINDOW[:5]
    + _R6_ADDED
    + _R7_RESTAMP
    + [
        n
        for n in _R6_WINDOW[5:]
        if n not in set(_R7_RESTAMP)
    ][: 50 - 5 - len(_R6_ADDED) - len(_R7_RESTAMP)]
)

if len(_R7_WINDOW) != 50 or len(set(_R7_WINDOW)) != 50:
    raise RuntimeError("r7 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R7_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r7 stamp window names unknown queries: {_missing}")

#: Queries whose IMPLEMENTATION changed in round 8 and already carry a
#: driver stamp from an earlier round, so they need a fresh one on the
#: new code path: the two embedding-stats queries rebuilt on the
#: overflow-safe exact_group_sums two-phase aggregation, plus
#: value_regression and term_burstiness whose corpus-scale product
#: sums were hardened the same way. The other round-8-modified queries
#: (pca_power_iteration, bloom_fp_rate_audit, weighted_median_exact,
#: gpd_tail_fit, gini_concentration, poisson_bootstrap_ci, ann_pq_topk,
#: ann_ivfpq_topk, ann_ivf_topk) were never stamped — they are round-7
#: additions and enter through the rotation below.
_R8_RESTAMP: list[str] = [
    "embedding_covariance_topk",
    "embedding_dim_variance",
    "value_regression",
    "term_burstiness",
]

#: The 67 round-7 additions exceed one 50-slot window (5 frag pins +
#: 2 restamps leave 43 free slots), so the rotation is split across
#: two rounds. Round 8 front-loads the judge's priorities — the ANN
#: family, the rank tests, the iterative fits whose CTE-replay oracles
#: are the most fragile — plus every round-8-modified query; the
#: remaining 24 are _R8_DEFERRED and form the core of the r9 window.
#: ROUND-9 ROTATION PLAN (apply at the START of round 9): keep the 5
#: frag pins, place _R8_DEFERRED next, add any r9-modified queries as
#: restamps, and refill from the r8 window in its original order.
_R8_PRIORITY: list[str] = [
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ndcg_eval",
    "mann_whitney_rank_test",
    "ks_one_vs_rest",
    "wasserstein_one_vs_rest",
    "spearman_corr_grouped",
    "kendall_tau_daily",
    "logreg_newton",
    "pca_power_iteration",
    "gpd_tail_fit",
    "gini_concentration",
    "bloom_fp_rate_audit",
    "weighted_median_exact",
]

_R8_STAMP: list[str] = _R8_PRIORITY + [
    n for n in _R7_ADDED if n not in set(_R8_PRIORITY)
][: 50 - 5 - len(_R8_RESTAMP) - len(_R8_PRIORITY)]

_R8_DEFERRED: list[str] = [n for n in _R7_ADDED if n not in set(_R8_STAMP)]

_R8_WINDOW: list[str] = _R7_WINDOW[:5] + _R8_STAMP + _R8_RESTAMP

if len(_R8_WINDOW) != 50 or len(set(_R8_WINDOW)) != 50:
    raise RuntimeError("r8 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R8_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r8 stamp window names unknown queries: {_missing}")

#: Queries whose IMPLEMENTATION changed in round 9 and already carry a
#: driver stamp, so they need a fresh one on the new code path: the six
#: consumers of exact_group_sums (the helper gained the
#: EXACT_SUM_MIN_BUCKET_ROWS floor + decimal fallback this round — no
#: current caller crosses the floor, but the driver should evidence
#: the family on the code that now contains the branch), which are
#: also the queries whose _emb_qstats sizing pre-pass became cached
#: per (session, sf_dir) this round.
_R9_RESTAMP: list[str] = [
    "embedding_covariance_topk",
    "embedding_dim_variance",
    "value_regression",
    "term_burstiness",
    "poisson_bootstrap_ci",
    "pca_power_iteration",
]

#: Round-9 window (the backlog-closing rotation the r8 verdict
#: prescribed): the 5 frag pins, ALL 26 _R8_DEFERRED queries (the only
#: registry entries never driver-stamped through r8 — stamping them
#: makes cumulative driver evidence 276/276), the 6 round-9 restamps,
#: and a refill of 13 unchanged queries from the round-8 window in its
#: original order.
_R9_STAMP: list[str] = list(_R8_DEFERRED)

_R9_WINDOW: list[str] = (
    _R8_WINDOW[:5]
    + _R9_STAMP
    + _R9_RESTAMP
    + [
        n
        for n in _R8_WINDOW[5:]
        if n not in set(_R9_RESTAMP)
    ][: 50 - 5 - len(_R9_STAMP) - len(_R9_RESTAMP)]
)

if len(_R9_WINDOW) != 50 or len(set(_R9_WINDOW)) != 50:
    raise RuntimeError("r9 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R9_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r9 stamp window names unknown queries: {_missing}")

#: Queries ADDED in round 9 (registered below the stamp window; they
#: rotate into the r10 stamp prefix). ROUND-10 ROTATION PLAN (apply at
#: the START of round 10): keep the 5 frag pins, place this list next,
#: add any r10-modified queries as restamps, and refill from the r9
#: window in its original order.
_R9_ADDED: list[str] = [
    "bpe_merge_learning",
    "line_quality_filter",
    "url_domain_dedup",
]

#: Queries whose IMPLEMENTATION changed in round 10 and already carry a
#: driver stamp, so they need a fresh one on the new code path:
#: intrinsic_dim_twonn (the r9 judge's weak item — its Σ|bucket|² LSH
#: pair expansion is now persisted across the m1/m2 minima instead of
#: being re-derived inside m2), and the six exact_group_sums consumers
#: (their shared _emb_qstats sizing memo gained dead-session eviction
#: this round).
_R10_RESTAMP: list[str] = [
    "intrinsic_dim_twonn",
    "embedding_covariance_topk",
    "embedding_dim_variance",
    "value_regression",
    "term_burstiness",
    "poisson_bootstrap_ci",
    "pca_power_iteration",
]

#: Round-10 window per the standing rotation convention: the 5 frag
#: pins, the 3 _R9_ADDED queries (registered below the window last
#: round, pytest-oracle green, now rotating in for their first driver
#: stamp — cumulative driver evidence reaches 279/279), the 7 round-10
#: restamps, and a refill of 35 unchanged queries from the round-9
#: window in its original order.
_R10_WINDOW: list[str] = (
    _R9_WINDOW[:5]
    + _R9_ADDED
    + _R10_RESTAMP
    + [
        n
        for n in _R9_WINDOW[5:]
        if n not in set(_R10_RESTAMP)
    ][: 50 - 5 - len(_R9_ADDED) - len(_R10_RESTAMP)]
)

if len(_R10_WINDOW) != 50 or len(set(_R10_WINDOW)) != 50:
    raise RuntimeError("r10 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R10_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r10 stamp window names unknown queries: {_missing}")

#: Queries ADDED in round 10 (registered below the stamp window; they
#: rotate into the r11 stamp prefix per the standing convention).
_R10_ADDED: list[str] = [
    "line_dedup_exact",
    "kn_bigram_perplexity",
    "unigram_lm_learning",
    "exact_substr_dedup",
    "nb_quality_classifier",
    "nb_calibration_audit",
    "quality_budget_mix",
    "nb_holdout_eval",
    "k_anonymity_audit",
    "pr_auc_by_source",
]

#: Queries whose IMPLEMENTATION changed in round 11 and already carry a
#: driver stamp, so they need a fresh one on the new code path:
#: line_quality_filter — the r10 hash red (`CORRECTNESS_r10.json`,
#: rows/schema green, value hash false), rebuilt on the NLL_LATTICE
#: integer quantization so no engine-ln double reaches the hash.
_R11_RESTAMP: list[str] = [
    "line_quality_filter",
]

#: Round-11 window per the standing rotation convention + the r10
#: verdict's tasks 1-3: the 5 frag pins, the 10 _R10_ADDED queries
#: (first driver stamps — every float surface among them was
#: lattice-hardened BEFORE first contact, per verdict task 2), the
#: line_quality_filter restamp on its lattice rebuild, and 34 refills
#: from the round-10 window in its original order. A green round makes
#: cumulative driver evidence 289/289.
_R11_WINDOW: list[str] = (
    _R10_WINDOW[:5]
    + _R10_ADDED
    + _R11_RESTAMP
    + [
        n
        for n in _R10_WINDOW[5:]
        if n not in set(_R11_RESTAMP)
    ][: 50 - 5 - len(_R10_ADDED) - len(_R11_RESTAMP)]
)

if len(_R11_WINDOW) != 50 or len(set(_R11_WINDOW)) != 50:
    raise RuntimeError("r11 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R11_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r11 stamp window names unknown queries: {_missing}")

#: Queries ADDED in round 11 (registered below the stamp window; they
#: rotate into the r12 stamp prefix per the standing convention).
_R11_ADDED: list[str] = [
    "logreg_hash_text",
    "exact_substr_incremental",
    "temperature_sampling_weights",
    "dedup_bcubed_eval",
    "heaps_law_fit",
    "data_constrained_effective_tokens",
    "shard_balance_audit",
    "dedup_cluster_cohesion",
    "rare_token_audit",
    "t_closeness_audit",
    "qlm_dirichlet_search",
    "doremi_domain_weights",
    "label_propagation_communities",
    "kcenter_coreset",
    "fellegi_sunter_linkage",
    "unimax_budget_allocation",
    "packing_truncation_audit",
    "coverage_greedy_selection",
    "wordpiece_learning",
    "grid_density_clusters",
    "tokenizer_compare_audit",
    "burrows_delta_stylometry",
    "dunning_g2_keyness",
    "jsd_source_divergence",
    "rbo_rank_agreement",
    "adamic_adar_linkpred",
    "degree_distribution_audit",
    "rrf_fusion_topk",
    "association_rules_lift",
    "seasonal_decomposition_audit",
]

#: Queries ADDED in round 12 (registered below the stamp window; they
#: rotate into the r13 stamp prefix per the standing convention).
_R12_ADDED: list[str] = [
    "streaming_near_dup",
    "crosslingual_dedup",
    "crosslingual_mate_retrieval",
]

#: Queries whose IMPLEMENTATION changed in round 12 and already carry a
#: driver stamp, so they need a fresh one on the new code path:
#: line_quality_filter — the r11 hash red AGAIN (`CORRECTNESS_r11.json`)
#: despite the NLL_LATTICE rebuild; the r11 verdict isolated the last
#: engine-divergent surface to the round-6 double mean, now replaced by
#: the all-integer ``mean_line_nll_q`` (Σ_line((lq·10⁶) div n_toks))
#: div n_lines — no round(double) reaches the hash at all.
_R12_RESTAMP: list[str] = [
    "line_quality_filter",
]

#: Round-12 window per the r11 verdict's task 3: the 5 frag pins, the
#: line_quality_filter restamp on its all-integer rebuild, the 30
#: _R11_ADDED queries (first driver stamps — pytest-oracle green at 3
#: SFs since r11), and 14 refills from the round-11 window in its
#: original order. A green round makes cumulative driver evidence
#: 319/319. (The round-12 flr-lattice sweep also rewrote every hashed
#: ROUND(double, k≥1) in BOTH engines to the repr-independent
#: floor(x·10^k + 0.5)/10^k form — value-identical off the boundary,
#: cross-engine-deterministic ON it — so refilled stamps re-certify
#: that class too.)
_R12_WINDOW: list[str] = (
    _R11_WINDOW[:5]
    + _R12_RESTAMP
    + _R11_ADDED
    + [
        n
        for n in _R11_WINDOW[5:]
        if n not in set(_R12_RESTAMP)
    ][: 50 - 5 - len(_R12_RESTAMP) - len(_R11_ADDED)]
)

if len(_R12_WINDOW) != 50 or len(set(_R12_WINDOW)) != 50:
    raise RuntimeError("r12 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R12_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r12 stamp window names unknown queries: {_missing}")

#: Queries whose IMPLEMENTATION (or oracle) changed in round 13 and
#: already carry driver history, so they need a fresh stamp on the new
#: code path:
#: line_quality_filter — the r12 hash red was finally traced to the
#:   ORACLE (un-cast SUMs typed HUGEINT by DuckDB → float64 in pandas
#:   vs Spark's bigint under the driver's TYPED hash); both columns now
#:   CAST(... AS BIGINT), Spark values already matched exactly.
#: crosslingual_mate_retrieval — gained the XL_MATE_MAX_BLOCK fail-fast
#:   on its exact ground-truth side (plan-shape change upstream of the
#:   per-language join).
_R13_RESTAMP: list[str] = [
    "line_quality_filter",
    "crosslingual_mate_retrieval",
]

#: Round-13 window per the r12 verdict's task 3: the 5 frag pins, the
#: line_quality_filter restamp on its BIGINT-cast oracle, the 3
#: _R12_ADDED queries (first driver stamps — pytest-oracle green at 3
#: SFs since r12; crosslingual_mate_retrieval doubles as its own
#: restamp after the r13 cap guard), and 41 refills from the round-12
#: window in its original order. A green round makes cumulative driver
#: evidence 322/322.
_R13_WINDOW: list[str] = (
    _R12_WINDOW[:5]
    + ["line_quality_filter"]
    + _R12_ADDED
    + [
        n
        for n in _R12_WINDOW[5:]
        if n not in set(_R13_RESTAMP) and n not in set(_R12_ADDED)
    ][: 50 - 5 - 1 - len(_R12_ADDED)]
)

if len(_R13_WINDOW) != 50 or len(set(_R13_WINDOW)) != 50:
    raise RuntimeError("r13 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R13_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r13 stamp window names unknown queries: {_missing}")

#: Queries ADDED in round 13 (registered below the stamp window; they
#: rotate into the r14 stamp prefix per the standing convention).
_R13_ADDED: list[str] = [
    "streaming_near_dup_compaction",
]

#: Queries whose IMPLEMENTATION (or oracle) changed in round 14 and
#: already carry driver history, so they need a fresh stamp on the new
#: code path:
#: approx_quantile_audit / quantile_disc_battery — oracle literals
#:   CAST({p} AS DOUBLE): a bare 0.5 is DECIMAL(2,1) to DuckDB and only
#:   matched Spark's double through .df()'s silent float64 coercion
#:   (the type tripwire now bans DECIMAL outputs; values identical).
#: ann_* (5) — the IVF centroids / PQ codebooks now come from the
#:   build-once _ann_quantizers artifact instead of per-query
#:   re-derivation, and probes run against the MATERIALIZED indexes
#:   (similarity.write_ivfpq_index: partition-pruned nprobe-list reads
#:   + stored PQ codes; the audits' LSH probes against the shared
#:   write_lsh_index artifact) — all bit-identical by determinism
#:   (r13 verdict task 2; parity pinned in tests/test_r14_additions).
#: bpe_merge_learning / wordpiece_learning — store their driver-held
#:   merge tables as the artifact (side effect only; plan unchanged).
#: tokenizer_compare_audit — consumes the cached merge tables instead
#:   of re-running both learners inline (r13 verdict task 3).
#: streaming_near_dup — durable-rooted probe growth, MissingDeltaError
#:   replay guard, and the compact_threshold policy (r13 ADVICE +
#:   verdict task 5).
_R14_RESTAMP: list[str] = [
    "approx_quantile_audit",
    "quantile_disc_battery",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_recall_audit",
    "ann_ndcg_eval",
    "bpe_merge_learning",
    "wordpiece_learning",
    "tokenizer_compare_audit",
    "streaming_near_dup",
]

#: Round-14 window per the r13 verdict's task 1: the 5 frag pins,
#: streaming_near_dup_compaction's FIRST driver stamp (the only
#: registry entry with zero driver evidence — a green row makes
#: cumulative driver evidence 323/323), the 11 r14 restamps, and 33
#: refills from the round-13 window in its original order.
_R14_WINDOW: list[str] = (
    _R13_WINDOW[:5]
    + _R13_ADDED
    + _R14_RESTAMP
    + [
        n
        for n in _R13_WINDOW[5:]
        if n not in set(_R14_RESTAMP)
    ][: 50 - 5 - len(_R13_ADDED) - len(_R14_RESTAMP)]
)

if len(_R14_WINDOW) != 50 or len(set(_R14_WINDOW)) != 50:
    raise RuntimeError("r14 stamp window must be exactly 50 unique queries")
_missing = [n for n in _R14_WINDOW if n not in _QUERIES_ALL]
if _missing:
    raise RuntimeError(f"r14 stamp window names unknown queries: {_missing}")

#: Queries ADDED in round 14 (registered below the stamp window; they
#: rotate into the r15 stamp prefix per the standing convention).
_R14_ADDED: list[str] = [
    "multimodal_real_resize",
    "multimodal_real_audio",
    "ann_index_balance_audit",
    "sequence_packing_audit",
    "ann_sq8_topk",
    "mcv_stats_audit",
    "sprt_ab_monitor",
    "multimodal_real_frames",
    "phrase_search_positional",
    "frag_consistent_hash_ring",
    "bitmap_index_intersection",
    "neyman_allocation_audit",
    "soft_dedup_weights",
]

_HEAD = _R14_WINDOW

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **{n: _QUERIES_ALL[n] for n in _HEAD},
    **{n: f for n, f in _QUERIES_ALL.items() if n not in set(_HEAD)},
}

ORACLE_SQL: dict[str, str] = {
    **{n: _ORACLE_SQL_ALL[n] for n in _HEAD if n in _ORACLE_SQL_ALL},
    **{
        n: s
        for n, s in _ORACLE_SQL_ALL.items()
        if n not in set(_HEAD)
    },
}
