package graft

/** Plan-audit main: dumps formatted physical plans for the queries
  * whose shape matters most at scale, so pushdown/broadcast/codegen
  * regressions are visible in review.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Session.local(8)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_agg_pushdown", "q_validate_filter", "q_dim_join", "q_multi_join_agg",
        "q_tracking_error", "q_daily_returns", "q_ann_bruteforce", "q_minhash_lsh",
        "q_ngram_jaccard", "q_rag_pipeline", "q_corr_matrix", "q_dedup_clusters",
        "q_simhash_neardup", "q_concentration", "q_ohlc_weekly", "q_repetition_score",
        "q_quality_gate", "q_corpus_stats", "q_top_bigrams", "q_ema_fold",
        "q_peer_performance", "q_indicator_trends", "q_risk_snapshot",
        "q_decontaminate", "q_pack_sequences", "q_interval_join",
        "q_dedup_keep_best", "q_domain_mix", "q_asof_tolerance",
        "q_ann_ivf", "q_shipping_priority", "q_large_volume_cust",
        "q_approx_distinct", "q_approx_percentiles",
        "q_sketch_merge", "q_salted_join", "q_repeated_spans",
        "q_ann_ivf_trained", "q_redact_pii",
        "q_simhash_wide_neardup", "q_semantic_dedup",
        "q_ngram_jaccard_banded", "q_semantic_dedup_trained",
        "q_token_budget_sample", "q_token_budget_rate",
        "q_perplexity", "q_ann_int8", "q_clean_normalize",
        "q_bloom_decontaminate", "q_bigram_perplexity",
        "q_bm25_topk", "q_weighted_sample", "q_temperature_mix",
        "q_heavy_hitters", "q_hard_negatives", "q_strip_spans",
        "q_containment", "q_temperature_mix_alpha",
        "q_corr_pairs_banded", "q_binary_entropy", "q_binary_chunks",
        "q_small_qty_revenue", "q_qualified_suppliers",
        "q_min_cost_supplier", "q_dormant_customers", "q_stochastic",
        "q_atr", "q_obv", "q_pmi_bigrams", "q_cluster_topterms",
        "q_random_projection", "q_binary_magic",
        "q_bloom_join", "q_vocab_coverage",
        "q_cohort_retention", "q_funnel",
        "q_ship_priority_classes", "q_promo_share",
        "q_or_predicate_revenue", "q_waiting_suppliers",
        "q_late_orders", "q_local_supplier_volume", "q_volume_shipping",
        "q_market_share", "q_product_profit", "q_returned_items",
        "q_important_parts", "q_cust_order_distribution",
        "q_top_supplier", "q_supplier_part_counts",
        "q_session_stats", "q_top_transitions", "q_time_to_conversion",
        "q_donchian", "q_cmf", "q_parkinson_vol", "q_knn_graph",
        "q_ks_test", "q_chi2", "q_char_ngrams",
        "q_pq_codes", "q_binary_neardup", "q_grouping_sets", "q_gap_detect",
        "q_williams_r", "q_mfi", "q_keltner", "q_acf",
        "q_welch_ttest", "q_mann_whitney", "q_dau_wau", "q_new_vs_returning",
        "q_zipf_slope", "q_cluster_sizes", "q_pq_search", "q_pagerank",
        "q_ivfpq_search", "q_merge_upsert", "q_calmar", "q_ulcer_index",
        "q_omega_ratio", "q_jaccard_estimate",
        "q_robust_zscore", "q_moments", "q_cusum", "q_linreg_trend",
        "q_entropy_profile", "q_incremental_dedup", "q_theilsen",
        "q_benford", "q_profile_table", "q_power_users", "q_churn",
        "q_variance_ratio", "q_readability", "q_triangle_count",
        "q_embed_norms", "q_source_overlap", "q_seasonal_decompose",
        "q_survival_curve", "q_vocab_shift",
        "q_basket_pairs", "q_revenue_cohorts", "q_rfm", "q_ship_lag",
        "q_runs_test", "q_discount_elasticity", "q_gini",
        "q_inter_event", "q_hourly_profile", "q_top_pc",
        "q_centroid_outliers", "q_embed_drift", "q_dup_rate_by_source",
        "q_pc_project", "q_class_balance",
        "q_ichimoku", "q_pivot_points", "q_cube", "q_unpivot_long",
        "q_edit_neardup", "q_ivf_recall", "q_peaks", "q_cluster_silhouette",
        "q_bfs_layers", "q_hurst", "q_pareto_frontier", "q_lead_lag_corr",
        "q_zscore_normalize", "q_target_encoding", "q_ab_test",
        "q_contribution_delta", "q_equidepth_histogram", "q_iqr_outliers",
        "q_user_features", "q_key_skew", "q_reconcile", "q_top_paths",
        "q_volume_profile", "q_drawdown_episodes", "q_cross_sectional_rank",
        "q_quintile_spread", "q_cluster_purity", "q_retrieval_precision",
        "q_feature_corr", "q_half_life", "q_mutual_info", "q_markov_stationary",
        "q_rolling_beta", "q_ewma_vol", "q_amihud", "q_roll_spread",
        "q_abc_classes", "q_doc_novelty", "q_intrinsic_dim",
        "q_kl_divergence", "q_burstiness", "q_spearman_corr", "q_kendall_trend",
        "q_capture_ratios", "q_cci", "q_aroon", "q_jarque_bera",
        "q_k_anonymity", "q_common_neighbors", "q_forecast_backtest",
        "q_anova", "q_grubbs", "q_knn_classify", "q_ljung_box",
        "q_entropy_rate", "q_inequality", "q_vortex", "q_cointegration",
        "q_pq_distortion", "q_cmo", "q_ultimate_osc", "q_assortativity",
        "q_code_detect", "q_woe_iv", "q_psi",
        "q_lang_confusion", "q_dedup_sim_histogram", "q_streaks",
        "q_adx", "q_trix", "q_heikin_ashi",
        "q_pacf", "q_market_timing", "q_bootstrap_ci",
        "q_hits", "q_degree_hist", "q_label_prop",
        "q_anomaly_days", "q_funnel_windowed", "q_template_prefixes",
        "q_cvar", "q_mmr_rerank", "q_stickiness",
        "q_fk_integrity", "q_seasonal_index", "q_lang_mix")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
