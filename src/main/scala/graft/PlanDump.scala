package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes PLANS.md: formatted physical plans of representative queries,
  * the artifact for auditing scan pruning / pushdown / join strategy /
  * shuffle placement at a glance. Run:
  * `sbt "runMain graft.PlanDump /root/testdata/sf0.01"` */
object PlanDump {
  private val picks = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_topk_revenue",
    "q21_asof_join", "q26_asof_custom", "q27_range_frame",
    "q36_skew_salted", "r03_cooccurrence", "r12_cf_precision",
    "d03_lsh_candidates", "d08_dup_clusters", "s01_knn_brute",
    "s03_knn_srp_lsh", "s05_knn_ivf", "t07_source_minhash",
    "t09_rolling_hash", "e01_tumbling_window", "m03_feature_stub",
    "d09_decontaminate", "d10_cross_source", "e12_sliding_window",
    "t12_stratified_sample", "t13_collocations", "i03_partition_prune",
    "q39_approx_quantiles", "q40_correlation", "q41_heavy_hitters",
    "q42_topk_agg", "r16_ann_serving",
    "q43_asof_outer", "s06_knn_pq", "s08_knn_ivf_trained",
    "i05_ann_index_persist", "e14_stream_neardup",
    "p01_curation_funnel", "i06_clustered_skip", "i07_merge_upsert",
    "d11_simhash_neardup", "e15_session_window",
    "g01_pagerank", "g02_triangles", "r17_ndcg", "d12_containment",
    "q44_asof_forward", "i08_binary_source",
    "g03_bfs_hops", "d13_star_clusters", "m06_chunk_reassembly",
    "r18_serving_payload", "t15_lang_confusion", "i09_zorder",
    "t21_chunk_dedup", "p04_token_mix", "r26_user_knn",
    "r27_next_basket", "g06_link_predict", "s12_range_search",
    "s13_maxsim", "e24_attribution", "q50_sliding_distinct",
    "i16_stats_manifest", "m08_av_sync",
    "t22_ngram_novelty", "t23_ngram_decontam", "r28_decayed_popularity",
    "d16_bow_dedup", "m09_token_budget", "q51_interval_merge",
    "s14_filtered_knn", "e25_lateness_profile",
    "p05_shard_export", "m11_sequence_packing", "t25_dsir_weights",
    "i18_snapshot_diff", "g07_label_prop", "g08_modularity",
    "q52_weighted_median", "r29_calibration", "t24_readability",
    "m10_phash_dedup", "s15_hard_negatives", "r30_rank_fusion",
    "d17_substr_dedup", "q53_mad_outliers", "q54_asof_nearest",
    "e27_trending", "g09_assortativity", "g10_random_walks",
    "r31_gini_exposure", "r32_interleaving", "r33_ips_eval",
    "p06_datacard", "t27_mojibake", "t28_fertility",
    "m12_modality_router",
    "i20_incremental_read", "i21_wap_publish", "i22_masked_export",
    "e28_stream_update_mode", "e29_retention_matrix",
    "e30_conversion_latency", "g11_hits", "d18_lsh_tuning",
    "p07_split_export", "q55_bootstrap_ci", "r34_two_stage",
    "r35_segment_parity", "t29_class_tfidf",
    "g13_ktruss", "g14_harmonic", "p08_curriculum", "p09_temperature_mix",
    "r37_auc", "r38_coverage_novelty", "t31_head_coverage",
    "t32_gopher_rules", "t33_bpe_merge", "e32_gap_monitor",
    "i23_quarantine", "m14_aspect_buckets",
    "m15_crossmodal_eval", "r39_epsilon_greedy", "g15_neighbor_sample",
    "p10_water_filling", "e33_dwell_time", "t34_feature_hashing",
    "d21_gdpr_delete", "r40_ucb_bandit",
    "r41_sppmi", "t35_zipf_fit", "q56_hierarchy_rollup",
    "p11_quality_calibration", "q57_interval_overlap", "r42_neg_sampling",
    "g16_ppr", "s17_tombstone_serve", "t36_bm25", "e34_session_paths",
    "i24_bloom_skip", "d22_prefix_filter", "t37_heaps_fit",
    "q58_sketch_rollup", "s18_mrl_prefix", "g17_clustering",
    "r43_seq_eval", "r44_rfm_features", "p12_epoch_allocation",
    "i25_pos_deletes", "i26_shallow_clone", "m16_cdc_chunking",
    "s19_hybrid_search", "e36_available_now",
    "e37_multisource_watermark", "e38_session_timers",
    "g18_diameter", "r45_complements",
    "q59_chi_square", "r46_wilson_ci", "e39_chained_windows",
    "i27_dynamic_overwrite", "t38_word_pmi",
    "s20_graph_ann", "m17_shot_detect", "g19_stress_centrality",
    "p13_doremi_reweight", "d23_record_linkage", "t39_jm_lambda_sweep",
    "g20_luby_mis", "e40_stream_scd_enrich", "m18_abr_ladder",
    "p14_filter_ablation",
    "i28_nested_pruning", "q60_ewma", "q61_runtime_filter",
    "q62_seasonal", "r47_slope_one", "e41_survival",
    "e42_shapley_attribution",
    "q63_match_recognize", "q64_bitmap_distinct", "q65_audience_overlap",
    "i29_column_lineage", "m19_vad_segments",
    "q66_ks_test", "r48_als_foldin", "s21_pq_residual",
    "g21_scc", "p15_quality_tradeoff", "e43_burn_rate",
    "i30_dsv2_manifest", "d24_threshold_curve", "q67_recursive_cte",
    "q68_equidepth", "r50_cohort_ltv", "g22_directed_profile")

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans (generated by graft.PlanDump)\n\n"
    sb ++= "Audit points: ReadSchema minimal, PushedFilters present, dims\n"
    sb ++= "broadcast, partial aggregation before every shuffle, no\n"
    sb ++= "unsanctioned cartesian products.\n"
    picks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      sb ++= s"\n## $name\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb ++= "```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
