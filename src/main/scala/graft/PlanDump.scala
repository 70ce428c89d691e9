package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the heaviest queries to a markdown
  * file — committed plan evidence, so a reviewer can audit the physical
  * shapes (pushed filters, broadcast vs shuffled joins, partial
  * aggregates, bounded top-k operators) without executing anything.
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outFile> [qNN qNN ...]`
  * (defaults to the scale-critical headliners).
  */
object PlanDump {

  private val defaults = Seq(
    "q01_scan_filter_project", "q03_join_enrich_broadcast",
    "q05_status_bands",
    "q22_dedup_minhash_lsh", "q24_ann_topk", "q35_ann_ivf",
    "q56_dup_clusters", "q61_ann_ivf_trained", "q70_bucketed_join",
    "q71_salted_skew_join", "q78_inverted_index", "q80_source_overlap",
    "q84_sparse_topk", "q87_bpe_pairs", "q88_length_deciles",
    "q91_merge_upsert", "q94_ngram_novelty", "q97_regression_stats",
    "q105_prefix_simjoin", "q111_concurrent_sessions",
    "q121_triangle_counts", "q193_domain_cap", "q195_canonical_docs",
    "q196_dup_spans", "q197_heavy_hitters", "q198_delta_dedup",
    "q199_vocab_coverage", "q203_dsir_weights", "q204_semdedup",
    "q205_source_divergence", "q206_cluster_keywords", "q208_cluster_purity",
    "q210_bpe_learn", "q219_skew_profile", "q220_join_cardinality",
    "q222_lsh_cost_planner", "q224_curriculum_order", "q225_shard_plan",
    "q228_manifest_merge", "q229_embedding_covariance", "q230_pca_power",
    "q234_split_leakage", "q235_ivf_recall", "q236_lm_fluency",
    "q237_repetition_profile", "q238_key_overlap",
    "q131_rfm_segments", "q155_price_band_mix",
    "q239_price_quantile_sketch", "q241_mass_estimate",
    "q242_bm25_topdocs", "q243_hybrid_rrf", "q244_source_ols",
    "q245_nb_confusion", "q246_score_auc", "q248_cm_freq_audit",
    "q249_zipf_slope", "q250_reciprocal_nn", "q251_cdc_chunks",
    "q252_youden_threshold", "q253_dpp_revenue", "q254_lm_affinity",
    "q255_dup_assortativity", "q256_decile_lift",
    "q257_exact_substring", "q258_cdc_ingest_probe", "q259_exact_scrub",
    "q260_chunk_flow", "q261_effective_tokens", "q262_kappa_agreement",
    "q263_pack_sweep", "q264_cluster_split", "q265_kn_fluency",
    "q266_shard_manifest", "q267_epoch_plan", "q268_neyman_alloc",
    "q269_blocklist_screen", "q270_margin_pairs", "q271_centroid_outliers",
    "q272_admission_audit", "q273_signal_agreement", "q274_substring_probe",
    "q275_hard_negatives", "q276_gdpr_erase", "q277_image_dhash_dups",
    "q278_audio_fp_dups", "q279_scene_cuts", "q280_dup_evidence",
    "q281_clip_dups", "q282_k_anonymity", "q283_pagerank",
    "q284_audio_vad", "q285_budget_select", "q286_dedup_mixture",
    "q287_target_mixture", "q288_diverse_select", "q289_decontam_scrub",
    "q290_isotonic_rate", "q291_code_switch", "q292_authority_canon",
    "q293_retention_sweep", "q294_lsh_recall_audit_t05",
    "q295_delta_pair_update", "q296_delta_assign", "q297_retrieval_eval",
    "q298_codebook_drift", "q299_contamination_matrix",
    "q300_neardup_contamination", "q200_lsh_recall_audit",
    "q301_audit_tier_profile", "q302_media_census",
    "q303_dup_rate_estimate", "q304_dup_rate_ci", "q26_multimodal_meta",
    "q27_multimodal_decode")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    val names = if (args.length > 2) args.drop(2).toSeq else defaults
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append(s"# Physical plans (`explain formatted`, $sfDir)\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.PlanDump <sfDir> PLANS.md\"`\n")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val scope = Caches.open()
          try {
            val full = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            // cached subtrees reprint their whole child plan inside every
            // InMemoryRelation reference — q292's superstep chain dumps
            // 15k lines of repeats. The head carries the shape; cap it.
            val lines = full.linesIterator.toSeq
            val plan = if (lines.size <= 800) full
              else lines.take(800).mkString("", "\n",
                s"\n... [${lines.size - 800} more lines — cached-subplan " +
                  "reprints — truncated]\n")
            sb.append(s"\n## $name\n\n```\n$plan```\n")
          } finally scope.release()
        case None =>
          System.err.println(s"[plandump] unknown query: $name")
      }
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote ${names.size} plans to $outFile")
    spark.stop()
  }
}
