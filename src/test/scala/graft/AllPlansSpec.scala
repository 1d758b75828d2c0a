package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry plan sweep: no registered query may degrade to an
  * unbounded cartesian/nested-loop join. Queries that deliberately cross-
  * join a bounded broadcast side (a 1-row query vector, a centroid array, a
  * scalar subquery) are listed with the reason — anything new that shows up
  * here unreviewed is a scale bug, not a style choice. */
class AllPlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** name -> why an NLJ/cross is acceptable there (bounded build side). */
  private val boundedCrossAllowed: Map[String, String] = Map(
    "sim1_cosine_topk" -> "1-row query-vector broadcast",
    "sim2_lsh_bucketed_ann" -> "1-row query-vector broadcast",
    "sim3_multiprobe_ann" -> "bits+1-row probe-set broadcast",
    "sim4_ivf_ann" -> "1-row centroid-array + 1-row query broadcast",
    "sim5_ann_recall" -> "bounded 20-row probe-set broadcast (the brute-force arm of the recall audit)",
    "cs14_ks_test" -> "1-row group-totals broadcast onto the binned CDF table",
    "cs15_benford_audit" -> "1-row corpus-total broadcast onto the 9-digit table",
    "cs16_rfm_segments" -> "1-row corpus-max-date broadcast (scalar subquery)",
    "ks4_hll_union_audit" -> "1-row sketch-estimate × 1-row exact-count broadcast",
    "mb1_association_rules" -> "1-row basket-total broadcast (the lift denominator)",
    "sa10_poisson_bootstrap" -> "32-row resample-index literal broadcast",
    "ts3_acf" -> "1-row mean + 1-row SS + 7-row lag-literal broadcasts onto the day table",
    "ts5_cusum_changepoint" -> "1-row series-mean broadcast onto the day table",
    "ml5_knn_classifier" -> "capped ≤50-probe broadcast (the exact-kNN audit arm; a corpus-fraction holdout rides batchTopK)",
    "gr5_modularity" -> "1-row total-edge-count broadcast (the modularity denominator)",
    "sim5b_ivf_trained_recall" -> "bounded 20-row probe-set + 1-row centroid-array broadcasts (brute-force truth arm + Lloyd assignment)",
    "sim6c_filtered_autowiden" -> "1-row radius-cutoff scalar + 2^bits-row probe-set broadcasts",
    "sim9_binary_rerank" -> "bounded 20-row probe-set broadcast; the coarse cross side carries only 24-byte binary code rows (brute-force truth arm is the audit's budgeted full scan)",
    "sim10_rp_rerank" -> "bounded 20-row probe-set broadcast; the coarse cross side carries only the 16-dim projected vectors (brute-force truth arm is the audit's budgeted full scan)",
    "sim11_matryoshka_recall" -> "bounded 20-row probe-set broadcast; one pair table feeds all truncation arms (brute-force truth arm is the audit's budgeted full scan)",
    "sim5c_kmeans_distortion" -> "1-row centroid-array + two 1-row objective-scalar broadcasts",
    "j5_scalar_subquery" -> "1-row max(last_seen) scalar broadcast",
    "ol1_winsorize" -> "1-row p01/p99 percentile scalar broadcast",
    "ol2_mad_outliers" -> "two 1-row median/MAD scalar broadcasts",
    "sa8_class_rebalance" -> "1-row min-class-count scalar broadcast",
    "ix3_bm25_topk" -> "1-row (N, avglen) corpus-stats scalar broadcast",
    "ks3_kmv_set_ops" -> "bounded cross of one 25-double sketch row per language (5 rows/side)",
    "p1_universe_filter" -> "1-row max(last_seen) scalar broadcast",
    "tx10_tfidf_terms" -> "1-row corpus-count scalar broadcast",
    "hq1_hist_quantiles" -> "3-row quantile-probe broadcast over the bounded bin list",
    "hq2_grouped_quantiles" -> "2-row quantile-probe broadcast over the bounded per-group bin list",
    "sa4_temperature_mix" -> "1-row mixture-normalizer broadcast",
    "sa11_epoch_resample" -> "1-row (N, Z) normalizer broadcast onto the per-source rate table (sa4's shape, upsampling half)",
    "ml6_target_encoding" -> "1-row global-prior broadcast (the smoothing target) onto the fact scan",
    "ml2_classifier_gate" -> "1-row score-threshold scalar broadcast + hq1's quantile-probe broadcast onto the bounded bin list",
    "cs2_source_psi" -> "1-row corpus-total broadcast onto the bounded source x bin grid",
    "tx13_unigram_logprob" -> "1-row token-total broadcast onto the vocab dictionary",
    "tx14_bigram_logprob" -> "1-row vocabulary-size broadcast onto the bigram table",
    "tx15_perplexity_buckets" -> "tx14's 1-row vocabulary-size broadcast + 1-row tercile-threshold scalar + hq1's quantile-probe broadcast onto the bounded bin list",
    "pipe8_curation_v2" -> "1-row mixture-normalizer broadcast (sa4's, composed)",
    "pipe10_curation_full" -> "1-row mixture-normalizer broadcast (sa4's, composed)",
    "sa9_split_chisq" -> "bounded splits x langs contingency cross (3 x |langs| rows) + 1-row grand-total broadcast",
    "sim12_sparse_cosine" -> "1-row corpus-count scalar broadcast (tx10's idf move)",
    "cs11_skew_report" -> "1-row table-total scalar broadcast onto the key-cardinality table",
    "cs13_ab_ztest" -> "1-row arm-B stats broadcast onto the 1-row arm-A stats",
    "cs21_source_jsd" -> "bounded lang-grid + 1-row corpus-total + 1-row vocab-count broadcasts (cs2's PSI grid shape)",
    "gr7_hits" -> "1-row max-hub/max-auth normalizer broadcast onto the node score table",
    "ml7_naive_bayes" -> "|langs|-row class-stats + 1-row vocab-count + 1-row train-doc-count broadcasts (the bounded NB model side)",
    "dd23_blocking_quality" -> "four 1-row count-aggregate broadcasts (the audit's scalar metrics row)",
    "ix4_lm_retrieval" -> "3-row query-term × 1-row corpus-total broadcast (the docs×terms smoothing grid)",
    "emb2_cosine_histogram" -> "fixed 20-row probe-set broadcast (the sim5-style audit arm; work is 20 × corpus, linear)",
    "pipe11_temporal_target_encoding" -> "1-row train-prior broadcast onto the bounded per-category table (ml6's smoothing move)",
    "sa13_group_kfold" -> "1-row total-distinct-users broadcast onto the 5-row fold table",
    "k20_incremental_ndv" -> "1-row merged-sketch-estimate × 1-row exact-count broadcast (ks4's audit shape)",
    "tx18_pmi_collocations" -> "1-row corpus-token-total broadcast onto the support-filtered pair table",
    "gr12_diameter_probe" -> "1-row sweep-2 summary broadcast onto the 1-row sweep-1 summary",
    "ol4_mahalanobis_outliers" -> "1-row moment-vector broadcast onto the user table (fixed-dim covariance)",
    "k24_partition_planner" -> "3-row probe-range dim broadcast (range join onto partition stats + match count)",
    "cs24_kendall_tau" -> "bounded aligned-day self-pair cross (O(days²) on the calendar span, ts9's argument) + three 1-row stat broadcasts",
    "gr13_bipartite_check" -> "1-row node-counts × 1-row odd-edge-counts broadcast (the verdict row)",
    "ml13_pr_sweep" -> "10-row threshold-grid range join onto the bounded length histogram + 1-row positive-total broadcast",
    "tok5_vocab_coverage" -> "6-row vocab-size grid range join onto the bounded token dictionary + 1-row totals broadcast",
    "hq4_selectivity_estimate" -> "3-row probe-range broadcast onto the bounded histogram buckets/bins",
    "j13_bloom_semi_join" -> "1-row metrics × 1-row bits-set-count broadcast (the audit verdict row)",
    "ts12_durbin_watson" -> "1-row (n, Σy) total broadcast onto the bounded day table",
    "ts13_mann_kendall" -> "bounded month-grid self-pair (≤84×84, ts9/cs24's argument) + two 1-row stat broadcasts",
    "km1_kaplan_meier" -> "1-row dataset-horizon broadcast onto the customer-grain spell table",
    "k27_partition_balance" -> "1-row (min,max) bounds broadcast onto the scan before bucketing",
    "ol6_grubbs" -> "1-row (n, Σy) total broadcast onto the bounded day table (ts12's shape)",
    "gr14_rich_club" -> "3-row degree-threshold grid broadcast onto the bounded degree/edge tables",
    "dd24_cluster_purity" -> "1-row n × 1-row purity × 1-row inverse-purity broadcasts (the verdict row)",
    "mb4_sequence_rules" -> "1-row total-users broadcast onto the bounded type-pair table",
    "tx23_heaps_law" -> "4-row checkpoint grid broadcast onto the doc/term scans (prefix sums without a prefix scan)",
    "cs34_conditional_entropy" -> "1-row total + 1-row entropy broadcasts onto the bounded transition table",
    "tx24_burstiness" -> "1-row corpus-count broadcast onto the term-stats table before TakeOrdered",
    "sa15_bootstrap_ci" -> "32-row resample-index literal broadcast + 1-row order-stat broadcasts",
    "k25_overlap_depth" -> "1-row max + 8-row probe-grid broadcasts onto the 16-row file-stat tables",
    "cs37_activity_uniformity" -> "1-row total/chi2/peak broadcasts over the bounded dow×hour cell table",
    "cs38_runs_test" -> "1-row count + 1-row median broadcasts onto the bounded day table",
    "gr16_component_histogram" -> "1-row component-totals broadcast onto the log2 size buckets",
    "dd26_band_agreement" -> "1-row total-pairs broadcast onto the ≤4-row vote histogram",
    "k28_delete_vector_plan" -> "1-row max-id broadcast onto the scan before file bucketing (k27's shape)",
    "hq6_histogram_estimator" -> "1-row bounds + 4-row probe-grid broadcasts onto the scan and 16-row histogram",
    "d12_fiscal_445" -> "12-row period-boundary literal broadcast range-joined onto the week column",
    "cs39_theil_index" -> "1-row (n, Σx) total broadcast onto the customer-grain spend table",
    "cs40_cramers_v" -> "1-row n/dims broadcasts onto the bounded source×lang grid (cs21's shape)",
    "w21_conversion_delay" -> "1-row count + 9-row decile-grid broadcasts onto the ranked delay table",
    "ts16_binary_segmentation" -> "1-row (n, Σy) total broadcast onto the bounded day table (ts12's shape)",
    "cs41_theil_decomposition" -> "1-row totals + 1-row between/total fold broadcasts onto the segment table",
    "gr17_boruvka_phase" -> "1-row node/edge/component stat broadcasts (the phase summary row)",
    "ml15_score_ks" -> "1-row class-totals broadcast onto the distinct-score CDF table",
    "cs42_mood_median" -> "1-row count/median/total broadcasts onto the bounded segment table",
    "ol7_grid_dbscan" -> "bounded core-cell 8-neighborhood offset self-join + 1-row summary broadcasts",
    "sa16_systematic_sample" -> "1-row sample-stats broadcast onto the population aggregate",
    "a15_semi_additive_balance" -> "1-row global-max-month broadcast onto the customer first-activity table",
    "w24_pareto_cutoffs" -> "1-row totals + 3-row threshold-grid broadcasts onto the ranked spend table",
    "gr19_dag_layers" -> "1-row height broadcast onto the bounded layer histogram",
    "ol8_robust_locations" -> "1-row count/median/bound-value broadcasts onto the ranked cents table",
    "f13_luhn_audit" -> "1-row validity-summary broadcast onto the 10-row sample",
    "k32_cow_vs_mor" -> "1-row max-id broadcast onto the scan before file bucketing (k28's shape)",
    "cs47_yuen_trimmed_t" -> "2-row trim-bound broadcast onto the ranked segment table + 1-row side join",
    "w26_xmr_control_chart" -> "1-row control-limit + longest-run broadcasts onto the day table",
    "cs48_hill_tail_index" -> "1-row pivot order-statistic broadcast onto the 128-row top-k",
    "mb5_abc_classification" -> "1-row revenue-total broadcast onto the ranked part table",
    "km2_nelson_aalen" -> "1-row dataset-horizon broadcast onto the customer-grain spell table",
    "km3_logrank_test" -> "1-row dataset-horizon broadcast onto the customer-grain spell table",
    "ts19_ljung_box" -> "1-row total + 1-row SS + 10-row lag-literal broadcasts onto the day table",
    "w27_max_drawdown" -> "1-row total + 1-row max-drawdown broadcasts onto the day table",
    "cs49_peak_concurrency" -> "1-row peak/summary broadcasts; the sweep itself is the two-level prefix sum",
    "w28_tail_risk" -> "1-row tail order-statistic broadcast onto the 1-row moments fold",
    "ml16_information_value" -> "1-row class-total broadcast onto the 17-row bin table",
    "ml17_gains_table" -> "1-row corpus-total broadcast onto the ranked docs (rank itself is the two-level prefix sum)",
    "ml18_brier_decomposition" -> "1-row corpus-total broadcast onto the ranked docs (rank itself is the two-level prefix sum)",
    "k33_rendezvous_routing" -> "1-row key-total broadcast onto the 8-row node rollup",
    "k35_t_closeness" -> "1-row population-total broadcast onto the (class, seg) table",
    "ts20_permutation_entropy" -> "1-row pattern-total broadcast onto the 6-row pattern table",
    "mb6_newsvendor" -> "1-row day-total + 1-row policy broadcasts onto the day table",
    "cs52_entropy_rate" -> "1-row transition-total broadcast onto the 5-row state table",
    "cs53_kruskal_wallis" -> "1-row tie-correction + 1-row H broadcasts onto the 7-row weekday table",
    "att5_shapley_attribution" -> "8-row coalition-mask subset join (bitwise containment, both sides bounded by 2^k)",
    "gr18_reciprocity" -> "1-row edge-count broadcast onto the 1-row reciprocal count",
    "cs55_cohens_kappa" -> "1-row agree + 1-row chance-expectation broadcasts onto the 1-row total",
    "ts21_variance_ratio" -> "1-row base-variance broadcast onto the 3-row q table",
    "ml19_ndcg_at_k" -> "1-row positive-count + 1-row IDCG broadcasts onto the 100-row top-k",
    "cs56_hoover_index" -> "1-row total broadcast onto the customer-grain count table",
    "ix7_rrf_fusion" -> "1-row corpus-stats broadcast onto the posting-bounded tf table (ix3's shape)",
    "cs57_pinball_loss" -> "1-row quantile-policy + 2-row tau broadcasts onto the day table",
    "mb7_repeat_curve" -> "10-row k-grid range join + 1-row total broadcast onto the customer-grain counts",
    "w30_underwater_spells" -> "1-row total + 1-row longest-spell broadcasts onto the day table",
    "gr20_degree_tail" -> "1-row node-total broadcast onto the ~10-row bin table",
    "k38_ttl_audit" -> "1-row horizon broadcast onto the event scan",
    "f12_damm_checksum" -> "1-row key-total broadcast onto the 10-row check-digit census",
    "sa20_cuped" -> "1-row midpoint broadcast onto the event scan",
    "w31_hourly_heatmap" -> "1-row total broadcast onto the 168-row hour-of-week grid",
    "sa21_sprt" -> "1-row decision/ending/verdict broadcasts onto the 1-row totals",
    "ts26_autocorr_time" -> "ts19's lag-table broadcasts plus a 1-row sign-cutoff broadcast")

  test("no registered query plans an unbounded cartesian / nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // several queries register cache() points while building their
        // plans; clear between queries so CacheManager never substitutes an
        // InMemoryRelation into a later query's (or suite's) inspected plan
        spark.sharedState.cacheManager.clearCache()
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hasNlj = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (hasNlj && !boundedCrossAllowed.contains(name)) Some(name) else None
    }
    spark.sharedState.cacheManager.clearCache()
    assert(offenders.isEmpty,
      s"unreviewed cartesian/nested-loop joins in: ${offenders.mkString(", ")}")
  }
}
