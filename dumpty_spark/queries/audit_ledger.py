"""Machine-readable oracle-independence ledger (VERDICT r10 #2).

ORACLE_AUDIT.md is the load-bearing correctness ledger — it caught the
Markov fixed-point and log-rank risk-set bugs — and this module keeps it
from rotting the way ADVICE.md did in r9: the classification lives HERE
in code, exhaustively (every registered query, exactly one category),
and ``tests/test_oracle_audit_complete.py`` enforces that

  * the ledger covers the registry exactly (a NEW query cannot register
    without adding a row here — the test fails on an unclassified name),
  * every non-A row names an anchor test that actually resolves
    (``tests/file.py::function`` must exist, checked by AST), and
  * every non-A query appears in ORACLE_AUDIT.md's prose tables, and
    every query the doc names is really registered (no ghost rows — the
    ledger's own first run caught ``q_ratio_variance`` in the doc vs the
    registered ``q_ratio_se``).

Categories (ORACLE_AUDIT.md "Classification"):

  A - oracle independent by construction: declarative ANSI SQL executed
      by DuckDB's own engine; shares only the specification.  No anchor
      required (the hash IS the cross-engine check).
  B - trajectory replays (unrolled iteration rounds): anchored by
      two-regime equality and/or hand-solved fixtures.
  C - formula/recursion replays: anchored by an independently coded
      derivation (different algorithm or algebraic form) or axioms.
  D - shared single-expression closed forms: anchored by identities/
      axioms on the published components.

A non-A anchor is the INDEPENDENT derivation that makes "hash-green" a
mathematical-truth claim instead of an engine-parity claim.
"""

from __future__ import annotations

# category -> {query_name: anchor ("tests/file.py::test_fn") or None}
AUDIT_B = {
    "q_betweenness_approx":
        "tests/test_frontier46.py::test_betweenness_exact_brandes_anchor",
    "q_bfs_reachability":
        "tests/test_graph_regimes_r6.py::test_bfs_regimes_agree",
    "q_bom_rollup":
        "tests/test_frontier23.py::test_bom_rollup_root_totals",
    "q_canonical_docs":
        "tests/test_ext_operators.py::test_connected_components_chain_and_clique",
    "q_cluster_cap_dedup":
        "tests/test_frontier5.py::test_cluster_cap_keeps_k_longest",
    "q_component_store_batches":
        "tests/test_component_store.py::test_batches_equal_full_recompute",
    "q_coverage_selection":
        "tests/test_frontier14.py::test_coverage_selection_greedy_invariants",
    "q_dedup_clusters":
        "tests/test_ext_operators.py::test_connected_components_chain_and_clique",
    "q_dedup_report":
        "tests/test_ext_operators.py::test_connected_components_chain_and_clique",
    "q_dedup_threshold_curve":
        "tests/test_frontier34.py::test_threshold_curve_monotone",
    "q_grid_dbscan":
        "tests/test_frontier29.py::test_grid_dbscan_hand_grid",
    "q_hits_scores":
        "tests/test_frontier27.py::test_hits_hand_graph",
    "q_kcore_parts":
        "tests/test_graph_regimes_r6.py::test_kcore_regimes_agree",
    "q_label_propagation":
        "tests/test_frontier4.py::test_lpa_distributed_equals_driver_regime",
    "q_leakage_safe_split":
        "tests/test_sampling.py::test_split_disjoint_exhaustive",
    "q_markov_attribution":
        "tests/test_oracle_independence.py::test_markov_attribution_exact_solve",
    "q_mmr_rerank":
        "tests/test_frontier19.py::test_mmr_first_pick_is_most_relevant_and_diversity_binds",
    "q_modularity_score":
        "tests/test_frontier27.py::test_modularity_bounds_and_consistency",
    "q_pack_documents":
        "tests/test_sampling.py::test_pack_greedy_rule_and_partition_invariance",
    "q_pagerank_parts":
        "tests/test_graph.py::test_pagerank_matches_numpy",
    "q_personalized_pagerank":
        "tests/test_frontier8.py::test_ppr_matches_numpy",
}

AUDIT_C = {
    "q_quantile_regression":
        "tests/test_frontier46.py::test_quantile_regression_profile_anchor",
    "q_bigram_perplexity":
        "tests/test_oracle_independence.py::test_bigram_perplexity_identities",
    "q_bleu_pairs":
        "tests/test_oracle_independence.py::test_bleu2_sqrt_form",
    "q_calibration_bins":
        "tests/test_oracle_independence.py::test_calibration_ece_reaggregation",
    "q_cohens_kappa":
        "tests/test_oracle_independence.py::test_cohens_kappa_determinant_form",
    "q_conformal_interval":
        "tests/test_oracle_independence.py::test_conformal_qhat_order_statistic",
    "q_conformal_intervals":
        "tests/test_oracle_independence.py::test_conformal_intervals_axioms",
    "q_covariance_spectrum":
        "tests/test_oracle_independence.py::test_covariance_spectrum_lapack_anchor",
    "q_discrete_hazard_regression":
        "tests/test_frontier45.py::test_discrete_hazard_regression_score_equations",
    "q_eb_shrinkage":
        "tests/test_oracle_independence.py::test_eb_shrinkage_convexity",
    "q_good_turing":
        "tests/test_oracle_independence.py::test_good_turing_identities",
    "q_holt_trend":
        "tests/test_oracle_independence.py::test_holt_trend_error_correction_form",
    "q_holt_winters":
        "tests/test_oracle_independence.py::test_holt_winters_error_correction_form",
    "q_isotonic_calibration":
        "tests/test_frontier44.py::test_isotonic_equals_stack_pav",
    "q_kaplan_meier":
        "tests/test_oracle_independence.py::test_kaplan_meier_cumprod_form",
    "q_kneser_ney":
        "tests/test_oracle_independence.py::test_kneser_ney_normalization_and_recompute",
    "q_kruskal_wallis":
        "tests/test_frontier45.py::test_kruskal_wallis_numpy_reference",
    "q_logistic_irls":
        "tests/test_oracle_independence.py::test_logistic_irls_score_equations",
    "q_logrank_test":
        "tests/test_frontier45.py::test_logrank_numpy_recompute_and_antisymmetry",
    "q_nelson_aalen":
        "tests/test_frontier45.py::test_nelson_aalen_cumsum_and_km_dominance",
    "q_seasonal_naive_mase":
        "tests/test_oracle_independence.py::test_mase_pandas_recompute",
    "q_shapley_attribution":
        "tests/test_frontier35.py::test_shapley_efficiency_and_shares",
    "q_theilsen_slope":
        "tests/test_statistics.py::test_theilsen_slope_numpy_median",
    "q_theilsen_trend":
        "tests/test_oracle_independence.py::test_theilsen_trend_median_of_slopes",
    "q_wilson_ranking":
        "tests/test_oracle_independence.py::test_wilson_defining_quadratic",
}

AUDIT_D = {
    "q_granger_lag1":
        "tests/test_frontier48.py::test_granger_lstsq_anchor",
    "q_mann_kendall":
        "tests/test_frontier48.py::test_mann_kendall_numpy_anchor",
    "q_levene_brown_forsythe":
        "tests/test_frontier47.py::test_brown_forsythe_numpy_anchor",
    "q_jarque_bera":
        "tests/test_frontier47.py::test_jarque_bera_numpy_anchor",
    "q_poisson_dispersion":
        "tests/test_frontier47.py::test_poisson_dispersion_pandas_anchor",
    "q_mcnemar_test":
        "tests/test_frontier46.py::test_mcnemar_exact_binomial_anchor",
    "q_cochrans_q":
        "tests/test_frontier46.py::test_cochrans_q_numpy_and_k2_reduction",
    "q_durbin_watson":
        "tests/test_frontier46.py::test_durbin_watson_numpy_anchor",
    "q_anova_oneway":
        "tests/test_frontier44.py::test_anova_numpy_recompute_and_partition",
    "q_benford_digits":
        "tests/test_statistics.py::test_benford_expected_is_log_law",
    "q_chi2_independence":
        "tests/test_statistics.py::test_chi2_and_mi_nonneg",
    "q_cuped_lift":
        "tests/test_statistics.py::test_cuped_variance_reduction_nonneg",
    "q_did_lift":
        "tests/test_statistics.py::test_did_cell_mean_identity",
    "q_distribution_drift":
        "tests/test_statistics.py::test_divergences_nonnegative",
    "q_embedding_drift":
        "tests/test_statistics.py::test_surprisal_and_drift_bounds",
    "q_fdr_weekday":
        "tests/test_statistics.py::test_fdr_pvalue_is_two_sided_normal",
    "q_gini_revenue":
        "tests/test_statistics.py::test_gini_mean_absolute_difference_form",
    "q_ips_offpolicy":
        "tests/test_statistics.py::test_ips_effective_sample_size_bound",
    "q_krippendorff_alpha":
        "tests/test_frontier44.py::test_krippendorff_coincidence_matrix_recompute",
    "q_ks_twosample":
        "tests/test_statistics.py::test_ks_critical_value_formula",
    "q_lorenz_deciles":
        "tests/test_statistics.py::test_lorenz_curve_shape_axioms",
    "q_mannwhitney_drift":
        "tests/test_statistics.py::test_mannwhitney_drift_matches_independent_reference",
    "q_mde_power":
        "tests/test_statistics.py::test_mde_power_inversion",
    "q_msprt_readout":
        "tests/test_statistics.py::test_msprt_identities",
    "q_mutual_information":
        "tests/test_statistics.py::test_chi2_and_mi_nonneg",
    "q_neyman_allocation":
        "tests/test_statistics.py::test_neyman_allocation_proportionality",
    "q_propensity_att":
        "tests/test_statistics.py::test_propensity_att_micro_identity",
    "q_psi_value_drift":
        "tests/test_statistics.py::test_divergences_nonnegative",
    "q_ratio_se":
        "tests/test_statistics.py::test_ratio_se_delta_vs_jackknife_agreement",
    "q_rouge_pairs":
        "tests/test_frontier44.py::test_rouge_cross_pins_bleu_hits",
    "q_source_kl_divergence":
        "tests/test_statistics.py::test_divergences_nonnegative",
    "q_text_tiling":
        "tests/test_statistics.py::test_text_tiling_depth_bounds",
    "q_unigram_surprisal":
        "tests/test_statistics.py::test_surprisal_and_drift_bounds",
    "q_woe_encoding":
        "tests/test_statistics.py::test_woe_iv_reaggregation",
}

AUDIT_A = {
    "q_seasonal_decompose": None,
    "q01_pricing_summary": None,
    "q02_min_cost_supplier": None,
    "q03_shipping_priority": None,
    "q04_priority_check": None,
    "q05_local_supplier_volume": None,
    "q06_forecast_revenue": None,
    "q07_nation_volume": None,
    "q08_market_share": None,
    "q09_product_profit": None,
    "q10_returned_items": None,
    "q11_important_stock": None,
    "q12_shipmode_priority": None,
    "q13_customer_distribution": None,
    "q14_promo_revenue": None,
    "q15_top_supplier": None,
    "q16_parts_supplier_cnt": None,
    "q17_small_quantity": None,
    "q18_large_orders": None,
    "q19_disjunctive_revenue": None,
    "q20_promotion_suppliers": None,
    "q21_waiting_suppliers": None,
    "q22_idle_customers": None,
    "q_adamic_adar": None,
    "q_adaptive_quality_cut": None,
    "q_agg_view_batches": None,
    "q_ann_composed_retrieval": None,
    "q_ann_index_prune_audit": None,
    "q_ann_ivf_topk": None,
    "q_ann_lsh_topk": None,
    "q_ann_nprobe_curve": None,
    "q_ann_pq_topk": None,
    "q_ann_recall_check": None,
    "q_approx_distinct": None,
    "q_approx_distinct_check": None,
    "q_approx_quantile_check": None,
    "q_array_hof": None,
    "q_arrow_lengths": None,
    "q_asof_join": None,
    "q_asof_join_forward": None,
    "q_asof_join_nearest": None,
    "q_association_rules": None,
    "q_autocorrelation": None,
    "q_balanced_resample": None,
    "q_bigram_lm": None,
    "q_binaryfile_ingest": None,
    "q_bitmap_distinct": None,
    "q_blocklist_screen": None,
    "q_bloom_prefilter_join": None,
    "q_bm25_search": None,
    "q_boilerplate_ngrams": None,
    "q_bootstrap_ci": None,
    "q_bpe_encode_stats": None,
    "q_bpe_merges": None,
    "q_bucketed_join": None,
    "q_burstiness": None,
    "q_categorical_entropy": None,
    "q_chained_window_rollup": None,
    "q_changepoint": None,
    "q_chunk_dedup": None,
    "q_chunk_documents": None,
    "q_clustering_coefficient": None,
    "q_cms_freq_check": None,
    "q_cogroup_asof": None,
    "q_cohort_ltv": None,
    "q_compaction_audit": None,
    "q_conditional_agg": None,
    "q_containment_pairs": None,
    "q_contamination": None,
    "q_corr_matrix": None,
    "q_cosine_topk": None,
    "q_cramers_v": None,
    "q_cross_join_regions": None,
    "q_crosscorr_leadlag": None,
    "q_csv_quarantine": None,
    "q_cube_counts": None,
    "q_cusum_alarm": None,
    "q_dataset_card": None,
    "q_dataset_fingerprint": None,
    "q_date_arithmetic": None,
    "q_decayed_store": None,
    "q_dedup_embedding": None,
    "q_dedup_exact": None,
    "q_dedup_keep_first": None,
    "q_degree_assortativity": None,
    "q_degree_tail": None,
    "q_delete_upsert_audit": None,
    "q_distinct_flags": None,
    "q_doclen_profile": None,
    "q_dp_release": None,
    "q_dup_spans": None,
    "q_edit_distance_pairs": None,
    "q_epoch_shuffle": None,
    "q_event_rate_anomaly": None,
    "q_event_transitions": None,
    "q_eventually_follows": None,
    "q_ewma_smoothing": None,
    "q_exists_subquery": None,
    "q_expectations": None,
    "q_fd_profile": None,
    "q_feature_hashing": None,
    "q_file_bloom_lookup": None,
    "q_filtered_cosine_topk": None,
    "q_fingerprints": None,
    "q_fisher_separability": None,
    "q_format_parity": None,
    "q_frequent_triples": None,
    "q_funnel_conversion": None,
    "q_fuzzy_match": None,
    "q_global_rownum": None,
    "q_golden_record": None,
    "q_grouping_sets": None,
    "q_heaps_fit": None,
    "q_heavy_hitters": None,
    "q_histogram_totalprice": None,
    "q_hll_overlap": None,
    "q_hubness_ann_composed": None,
    "q_hubness_audit": None,
    "q_hybrid_search_rrf": None,
    "q_image_decode": None,
    "q_image_headers": None,
    "q_incremental_dedup_store": None,
    "q_incremental_neardedup_store": None,
    "q_incremental_watermark": None,
    "q_interleave_mix": None,
    "q_interp_asof_join": None,
    "q_interpolate_gaps": None,
    "q_interval_join": None,
    "q_introspect_minmax": None,
    "q_inverted_bm25": None,
    "q_item_knn": None,
    "q_jaro_winkler_match": None,
    "q_join_cardinality_est": None,
    "q_join_skew_report": None,
    "q_join_view_store": None,
    "q_json_props": None,
    "q_julienne_boundaries": None,
    "q_kanonymity_audit": None,
    "q_kendall_daily": None,
    "q_label_centroids": None,
    "q_langid_confusion": None,
    "q_last_touch_attribution": None,
    "q_layout_depth_audit": None,
    "q_leakage_screen": None,
    "q_limit_offset": None,
    "q_lsh_param_planner": None,
    "q_lttb_downsample": None,
    "q_luhn_scan": None,
    "q_mad_outliers": None,
    "q_manifest_time_travel": None,
    "q_map_event_profile": None,
    "q_matryoshka_audit": None,
    "q_merge_audit": None,
    "q_merkle_diff": None,
    "q_mg_topk_store": None,
    "q_mh_odds_ratio": None,
    "q_minhash_lsh_pairs": None,
    "q_minmax_scale": None,
    "q_multimodal_bytes": None,
    "q_multimodal_decode": None,
    "q_multimodal_frames": None,
    "q_multivar_ols": None,
    "q_mutual_nn_margin": None,
    "q_ndcg_eval": None,
    "q_negative_sampling": None,
    "q_neighborhood_function": None,
    "q_nested_roundtrip": None,
    "q_ngram_jaccard_pairs": None,
    "q_ngram_novelty": None,
    "q_normalize_data": None,
    "q_not_in_subquery": None,
    "q_ntile_partition_hist": None,
    "q_oof_regression_eval": None,
    "q_orc_roundtrip": None,
    "q_outer_join_counts": None,
    "q_pair_graph_health": None,
    "q_pandas_grouped_agg": None,
    "q_pandas_scalar_udf": None,
    "q_pandas_zscore": None,
    "q_pareto_frontier": None,
    "q_part_cooccurrence": None,
    "q_peak_concurrency": None,
    "q_percent_rank": None,
    "q_percentiles": None,
    "q_pii_redact": None,
    "q_pipeline_compose": None,
    "q_pivot_linestatus": None,
    "q_pmi_collocations": None,
    "q_position_attribution": None,
    "q_prefix_filter_pairs": None,
    "q_prefixspan_triples": None,
    "q_profile_columns": None,
    "q_quality_scores": None,
    "q_quantile_accuracy_ladder": None,
    "q_quantile_normalize": None,
    "q_quantile_store_batches": None,
    "q_rake_keywords": None,
    "q_random_projection": None,
    "q_range_join": None,
    "q_readability": None,
    "q_referential_integrity": None,
    "q_repetition_ratio": None,
    "q_resample_ffill": None,
    "q_retention_cohorts": None,
    "q_rfm_segments": None,
    "q_rolling_bollinger": None,
    "q_rolling_median": None,
    "q_rollup_quantity": None,
    "q_salted_join": None,
    "q_sample_exact_k": None,
    "q_sample_hash": None,
    "q_sample_stratified": None,
    "q_sample_stratified_k": None,
    "q_sample_weighted": None,
    "q_sample_weighted_k": None,
    "q_scalar_strings": None,
    "q_scalar_subquery": None,
    "q_scd2_interval_audit": None,
    "q_scd2_point_in_time": None,
    "q_schema_evolution": None,
    "q_seasonal_residuals": None,
    "q_semi_anti_join": None,
    "q_sequence_match": None,
    "q_series_trend": None,
    "q_session_paths": None,
    "q_session_windows": None,
    "q_setops_customers": None,
    "q_shard_rebalance": None,
    "q_silhouette_labels": None,
    "q_simhash_pairs": None,
    "q_sketch_distinct": None,
    "q_skew_report": None,
    "q_slice_histogram": None,
    "q_sliding_distinct": None,
    "q_sliding_window": None,
    "q_source_divergence": None,
    "q_source_overlap_matrix": None,
    "q_spearman_corr": None,
    "q_split_finder": None,
    "q_stats_agg": None,
    "q_stemmed_term_freq": None,
    "q_table_diff": None,
    "q_target_encoding": None,
    "q_temperature_mix": None,
    "q_template_dedup": None,
    "q_text_stats": None,
    "q_textlines_ingest": None,
    "q_tfidf_top_terms": None,
    "q_time_to_convert": None,
    "q_time_weighted_avg": None,
    "q_timedecay_attribution": None,
    "q_token_budget_mix": None,
    "q_token_counts": None,
    "q_tokenizer_fertility": None,
    "q_topk_orders": None,
    "q_train_test_split": None,
    "q_trending_events": None,
    "q_triangle_count": None,
    "q_tumbling_window": None,
    "q_udtf_long_words": None,
    "q_unpivot": None,
    "q_variant_props": None,
    "q_vector_quantize": None,
    "q_vocab_coverage": None,
    "q_watermark_profile": None,
    "q_weighted_jaccard": None,
    "q_weighted_median": None,
    "q_welch_ttest": None,
    "q_window_dedup": None,
    "q_window_lag_lead": None,
    "q_window_rank_per_segment": None,
    "q_window_running_total": None,
    "q_winsorized_stats": None,
    "q_zipf_fit": None,
    "q_zorder_skipping": None,
}



def classification() -> dict[str, tuple[str, str | None]]:
    """name -> (category, anchor-or-None), every registered query."""
    out: dict[str, tuple[str, str | None]] = {}
    for cat, table in (("A", AUDIT_A), ("B", AUDIT_B),
                       ("C", AUDIT_C), ("D", AUDIT_D)):
        for name, anchor in table.items():
            if name in out:
                raise ValueError(f"{name} classified twice")
            out[name] = (cat, anchor)
    return out

