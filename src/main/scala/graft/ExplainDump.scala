package graft

/** Regenerates EXPLAIN.md: formatted physical plans of the headline queries,
  * committed so plan quality is reviewable without running Spark. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("explain")
    val dir = "/root/testdata/sf0.001"
    val headline = Seq(
      "q01_scan_filter_project", "q04_dedup_keep_first", "q07_semi_join",
      "q09_upsert_merge", "q10_upsert_audit", "q13_group_agg",
      "q27_minhash_neardup", "q29_cosine_topk", "q32_salted_mode",
      "q37_ann_buckets", "q38_simhash",
      "q41_asof_join", "q42_sessionize", "q47_topk_per_group",
      "q48_hash_sample", "q51_session_concurrency",
      "q52_scd2_merge", "q56_salted_join", "q59_containment",
      "q61_token_packing", "q69_composite_split", "q70_volume_drift",
      "q71_category_drift", "q72_weighted_quality",
      "q73_incremental_dedup", "q74_range_join", "q75_tfidf_terms",
      "q76_pii_redaction", "q79_zorder_value", "q80_mixture_resample",
      "q82_decontamination", "q83_char_diversity", "q86_countmin", "q87_bloom",
      "q89_funnel", "q90_cohort_retention", "q92_interval_overlap",
      "q93_source_cap", "q94_semdedup", "q96_corpus_report",
      "q97_gopher_rules", "q99_token_budget", "q100_collocations",
      "q101_corpus_diff", "q102_attribution", "q104_oov_rate",
      "q107_pagerank", "q108_cluster_rep", "q109_shard_order",
      "q110_temperature_mix", "q111_host_block", "q112_bpe_pairs",
      "q113_cdc_chunks", "q114_luhn_cards", "q115_source_overlap",
      "q117_skew_report", "q118_histogram_drift", "q119_equal_freq_bins",
      "q120_triangles", "q121_ppr",
      "q122_basket_pairs", "q123_fuzzy_match", "q124_robust_stats",
      "q125_grid_resample", "q126_prefix_jaccard", "q127_weighted_sample",
      "q128_khop_reach", "q129_scd2_history", "q130_trailing_features",
      "q131_trend_slope", "q134_weighted_median", "q135_chi2",
      "q136_rendezvous", "q137_phrase_search", "q138_hard_negatives",
      "q139_rolling_actives", "q140_group_quantiles", "q143_sorted_neighborhood",
      "q144_incremental_agg", "q145_vocab_coverage", "q146_boilerplate",
      "q147_markup_strip", "q148_unicode_key", "q149_bloom_prune",
      "q150_link_extract", "q151_hist_quantiles", "q152_ann_recall",
      "q154_temporal_split", "q157_dup_size_hist",
      "q158_exact_substring", "q159_neardup_registry", "q160_bpe_encode",
      "q161_zorder3", "q162_hilbert3", "q163_substr_removal",
      "q164_bpe_fertility", "q165_chunk_dup_bytes", "q166_semdedup_sqrtn",
      "q167_registry_compact", "q168_pq_recall", "q169_dedup_card",
      "q170_bpe_train", "q171_ivf_adc", "q172_xsub_registry",
      "q173_xsub_rolling", "q174_ivfpq_residual", "q175_xsub_compact",
      "q176_gram_novelty", "q177_source_verbatim",
      "q178_semdedup_registry", "q179_ivf_nprobe_curve",
      "q180_pq_energy_audit", "q181_index_append",
      "q182_semdedup_tau_curve", "q183_ann_rank_metrics",
      "q184_sq8_recall", "q185_index_drift", "q186_ivf_sq8",
      "q187_lang_mix", "q188_semantic_balance", "q189_index_card",
      "q190_lsh_geometry", "q191_bloom_curve", "q192_cms_width_curve",
      "q193_packing_card", "q194_index_takedown", "q195_registry_takedown",
      "q196_release_funnel", "q197_registry_ops", "q198_nsw_lite",
      "q199_takedown_receipt", "q200_takedown_blast",
      "q201_nsw_degree_curve", "q202_incremental_funnel",
      "q203_nsw_takedown", "q204_temperature_curve",
      "q205_decon_tau_curve", "q206_dim_trunc_curve",
      "q207_dedup_overlap", "q208_release_lifecycle",
      "q209_nsw_takedown_curve", "q210_split_leakage",
      "q211_unigram_xent", "q212_soft_dedup", "q213_xent_frozen",
      "q214_unigram_compact", "q215_dsir_weights",
      "q216_bigram_lambda_curve", "q217_filter_overlap",
      "q218_nb_classifier", "q219_bm25_topk", "q220_phash_neardup",
      "q221_epoch_shuffle", "q222_selection_agreement",
      "q223_classifier_eval", "q224_kneser_ney", "q225_doremi_step",
      "q226_calibration_card", "q227_decon_agreement",
      "q228_hybrid_rrf", "q229_perplexity_buckets",
      "q230_selection_threshold_curve", "q231_eval_contamination",
      "q232_unimax_allocation", "q233_repeat_value",
      "q234_macro_micro_xent", "q235_rrf_k_curve",
      "q236_mix_manifest", "q237_postings_lifecycle",
      "q238_rejection_ledger", "q239_modal_agreement",
      "q240_score_takedown", "q241_incremental_repack",
      "q242_postings_ops", "q243_mix_rebalance", "q244_release_mix",
      "q245_filtered_ann", "q246_packing_length_curve", "q247_shard_qa",
      "q248_anneal_schedule", "q249_epoch_cap_curve",
      "q250_governance_shift", "q251_partitioned_ann",
      "q252_bpe_packing", "q253_curriculum_order",
      "q254_release_bpe_pack", "q255_part_index_nights",
      "q256_training_schedule", "q257_stream_packing",
      "q258_shard_checksums", "q259_shuffle_qa",
      "q260_batch_buckets", "q261_mix_sensitivity",
      "q262_shard_invalidation", "q263_vocab_growth",
      "q264_anneal_exposure", "q265_fertility_drift",
      "q266_shard_curve", "q267_eval_draw",
      "q268_langid_confusion", "q269_dup_source_matrix",
      "q270_fresh_anneal", "q271_bpe_schedule",
      "q272_anneal_quality_bar", "q273_langid_misrouting",
      "q274_priority_keep", "q275_priority_impact",
      "q276_share_distortion", "q277_misrouting_allocation",
      "q278_tuned_anneal", "q279_anneal_quality_bar_bpe",
      "q280_tuned_anneal_bpe", "q281_corrected_allocation",
      "q282_priority_funnel", "q283_split_corrected_allocation",
      "q284_priority_mix_shift")
    val sb = new StringBuilder
    sb.append("# EXPLAIN — headline query plans (formatted, sf0.001, regenerate with `sbt \"runMain graft.ExplainDump\"`)\n")
    sb.append("\nWhat to look for: `PushedFilters`/`ReadSchema` on every scan, broadcast\njoins where one side is small, partial aggregation before each hash\nexchange, `WindowGroupLimit` ahead of top-k windows, and no\n`CartesianProduct` anywhere.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n```\n")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(plan.linesIterator.take(60).mkString("\n"))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/EXPLAIN.md"),
      sb.toString.getBytes("UTF-8"))
    println("wrote EXPLAIN.md")
    spark.stop()
  }
}
