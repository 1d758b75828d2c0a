package graft.queries

/** The driver-mode bench tier (BENCH.md "Core tier", round 13).
  *
  * Round 12's driver bench timed out (rc 124): 463 registered queries ×
  * (untimed warmup + 3 timed passes) ≈ 4 × 300 s no longer fit the driver's
  * window. The fix is a REPRESENTATIVE CORE timed by default, with the full
  * registry still available behind `SPARK_GRAFT_BENCH_FULL=1` for the
  * committed per-round artifact (`bench/bench_r{N}.json`).
  *
  * Selection rule (derived once from `bench/bench_r12.json`, the last
  * full-coverage artifact, and frozen as an explicit list so the tier is
  * auditable and stable across rounds):
  *   - the 2 heaviest queries of every family prefix (41 families), so every
  *     operator family keeps a timed datapoint;
  *   - every query ≥ 1.0 s at sf0.1 (the expensive tail the plan audits
  *     read);
  *   - every end-to-end pipeline (pipe*);
  *   - the audit-tier sampled twins (dd17b/dd10b).
  * 127 queries, ≈184 s per pass at sf0.1 — warmup + 2 timed passes lands
  * near 650 s including JVM/sbt startup, comfortably inside the window that
  * killed the 1200 s full run.
  */
object BenchCore {
  val names: Set[String] = Set(
    "a15_semi_additive_balance", "a4_group_window_max",
    "at1_last_touch_attribution", "att2_linear_attribution",
    "att5_shapley_attribution", "cc1_connected_components",
    "ck2_sequence_packing", "ck3_pack_efficiency", "cs47_yuen_trimmed_t",
    "cs49_peak_concurrency", "cs6_column_profile", "d12_fiscal_445",
    "d13_business_day_lag", "dd10b_fingerprint_sampled",
    "dd14_containment", "dd15_semantic_dedup", "dd16_duplicated_spans",
    "dd17b_lsh_scurve_sampled", "dd19_edit_distance",
    "dd20_cluster_keep_best", "dd21_cdc_chunk_dedup",
    "dd22_prefix_filter_join", "dd23_blocking_quality",
    "dd24_cluster_purity", "dd26_band_agreement",
    "dd2b_minhash_lsh_xxhash", "dd2c_minhash_estimate_error",
    "dd3_ngram_jaccard", "dd6_neardup_pipeline", "dd7_simhash_pairs",
    "dd7b_simhash64_pairs", "dd9_dup_clusters", "emb1_hashing_vectorizer",
    "emb2_cosine_histogram", "f10_enum_ordinal", "f13_luhn_audit",
    "gr12_diameter_probe", "gr13_bipartite_check",
    "gr16_component_histogram", "gr17_boruvka_phase", "gr19_dag_layers",
    "gr1_triangle_count", "gr2_bfs_levels", "gr5_modularity",
    "gr9_neighbor_jaccard", "hll1_approx_distinct_audit",
    "hq4_selectivity_estimate", "hq6_histogram_estimator",
    "ix1_inverted_index", "ix3_bm25_topk", "j1_fiscal_copy_guard",
    "j2_superseded_cleanup", "k18_column_drift_audit",
    "k19_skipping_audit", "km1_kaplan_meier", "km3_logrank_test",
    "ks2_countmin_hh", "ks3_kmv_set_ops", "lp1_label_propagation",
    "mb1_association_rules", "mb2_frequent_triples",
    "mb3_item_cooccurrence", "ml14_mcc_gate", "ml15_score_ks",
    "ml1_logreg_quality", "ml2_classifier_gate", "ml3_calibration",
    "ml7_naive_bayes", "mm4_ppm_reencode", "mm5_png_roundtrip",
    "o1_pk_sort", "ol7_grid_dbscan", "ol8_robust_locations",
    "p1_universe_filter", "p2_date_eq", "pipe10_curation_full",
    "pipe11_temporal_target_encoding", "pipe1_estimates_eps_load",
    "pipe1b_rank_score", "pipe1c_sales_estimate", "pipe1d_eps_revision",
    "pipe1e_eps_perception", "pipe1f_eps_history",
    "pipe2_income_stmt_load", "pipe2b_income_strict_load",
    "pipe3_balance_equity_load", "pipe3b_balance_assets_load",
    "pipe3c_balance_liabilities_load", "pipe4_cash_flow_load",
    "pipe4b_cash_flow_legacy_load", "pipe5_earnings_calendar_pipeline",
    "pipe6_curation", "pipe7_dividend_calendar_pipeline",
    "pipe8_curation_v2", "pipe9_curation_v3", "pr1_pagerank",
    "rl1_jaro_winkler_block", "rl2_entity_clusters",
    "rp1_random_projection", "s5_raw_zone_scan", "sa15_bootstrap_ci",
    "sa7_split_leakage", "scd1_type2_history", "sim12_sparse_cosine",
    "sim5b_ivf_trained_recall", "sim5c_kmeans_distortion",
    "st2_session_windows", "st8_late_data_audit", "tok1_bpe_train",
    "tok4_fertility", "ts14_hurst", "ts4_markov_transitions",
    "tx12_dup_ngram_chars", "tx15_perplexity_buckets",
    "tx20_rake_keyphrases", "tx27_char_bigram_entropy", "tx5_winnowing",
    "tx5b_winnowing_xxhash", "tx7_contamination", "u4_balance_sheet_cells",
    "u7_cash_flow_2024_cells", "vq1_scalar_quantization",
    "vq2_product_quantization", "w10_session_paths", "w2_keep_latest",
    "zo1_zorder_layout", "zo2_hilbert_layout")

  /** The JIT-sensitive core-tier warm family (Bench core mode runs ONE
    * untimed execution of these before the timed passes — the r14
    * measurement fix). r15 (ADVICE r14): frozen as an EXPLICIT list —
    * previously selected by name prefix (u, pipe, k2, s5), which would
    * silently warm any future query sharing a prefix and silently miss a
    * renamed one. This list is exactly the set the r14 prefixes matched
    * within [[names]]: the HTML-parse/document pipelines whose per-doc
    * parse methods need ~15k invocations to reach C2 steady state. */
  val warmNames: Set[String] = Set(
    "pipe10_curation_full", "pipe11_temporal_target_encoding",
    "pipe1_estimates_eps_load", "pipe1b_rank_score", "pipe1c_sales_estimate",
    "pipe1d_eps_revision", "pipe1e_eps_perception", "pipe1f_eps_history",
    "pipe2_income_stmt_load", "pipe2b_income_strict_load",
    "pipe3_balance_equity_load", "pipe3b_balance_assets_load",
    "pipe3c_balance_liabilities_load", "pipe4_cash_flow_load",
    "pipe4b_cash_flow_legacy_load", "pipe5_earnings_calendar_pipeline",
    "pipe6_curation", "pipe7_dividend_calendar_pipeline",
    "pipe8_curation_v2", "pipe9_curation_v3", "s5_raw_zone_scan",
    "u4_balance_sheet_cells", "u7_cash_flow_2024_cells")
}
