package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` with
  * IDENTICAL output column names; floating-point aggregates are routed
  * through DECIMAL on both sides so results hash-match bit-for-bit
  * (see graft.functions.Exact).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The testdata analog of the reference's enrichment pipeline: stream
    * events ⋈ two dims → ordered CASE status bands
    * (reference: script/TributeStreamingJob.py:106-135).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.statusBands(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (Relational.scanFilterProject _),
    "q02_agg_pricing_summary" -> (Relational.aggPricingSummary _),
    "q03_join_enrich_broadcast" -> (Relational.joinEnrichBroadcast _),
    "q04_join_multi_revenue" -> (Relational.joinMultiRevenue _),
    "q05_status_bands" -> (Relational.statusBands _),
    "q06_latest_state_per_key" -> (Relational.latestStatePerKey _),
    "q07_row_to_json" -> (Relational.rowToJson _),
    "q08_cast_projection" -> (Relational.castProjection _),
    "q09_topk_orders" -> (Relational.topKOrders _),
    "q10_semi_join_active" -> (Relational.semiJoinActiveCustomers _),
    "q11_anti_join_dormant" -> (Relational.antiJoinDormantCustomers _),
    "q12_distinct_user_events" -> (Relational.distinctUserEvents _),
    "q13_window_tumbling_daily" -> (Relational.windowTumblingDaily _),
    "q14_union_high_low" -> (Relational.unionHighLowValue _),
    "q15_sessionize" -> (Relational.sessionize _),
    "q16_text_tokens" -> (TextAnalysis.tokens _),
    "q17_text_quality" -> (TextAnalysis.quality _),
    "q18_text_langid" -> (TextAnalysis.langid _),
    "q19_text_fingerprint" -> (TextAnalysis.fingerprint _),
    "q20_dedup_exact" -> (Dedup.exact _),
    "q21_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q22_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q23_dedup_simhash" -> (Dedup.simhash _),
    "q24_ann_topk" -> ((s, d) => Similarity.annBruteForceTopK(s, d)),
    "q25_emb_neardup_lsh" -> ((s, d) => Similarity.nearDupLsh(s, d)),
    "q26_multimodal_meta" -> (Multimodal.meta _),
    "q27_multimodal_decode" -> (Multimodal.decodeFeatures _),
    "q28_rollup_revenue" -> (Advanced.rollupRevenue _),
    "q29_cube_events" -> (Advanced.cubeEvents _),
    "q30_asof_last_order" -> (Advanced.asofLastOrder _),
    "q31_range_join_bands" -> (Advanced.rangeJoinBands _),
    "q32_above_customer_avg" -> (Advanced.aboveCustomerAvg _),
    "q33_topk_per_customer" -> ((s, d) => Advanced.topKPerCustomer(s, d)),
    "q34_salted_skew_agg" -> ((s, d) => Advanced.saltedSkewAgg(s, d)),
    "q35_ann_ivf" -> (Similarity.annIvf _),
    "q36_mm_resize" -> (Multimodal.resizeThumbnail _),
    "q37_mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "q38_text_winnow" -> ((s, d) => TextAnalysis.winnowFingerprint(s, d)),
    "q39_vocab_topk" -> (Corpus.vocabTopK _),
    "q40_split_assign" -> (Corpus.splitAssign _),
    "q41_length_quantiles" -> (Corpus.lengthQuantiles _),
    "q42_sketch_profile" -> (Corpus.sketchProfileKmv _),
    "q43_intersect_users" -> (Relational.intersectUsers _),
    "q44_except_users" -> (Relational.exceptUsers _),
    "q45_pivot_event_counts" -> (Relational.pivotEventCounts _),
    "q46_full_outer_activity" -> (Relational.fullOuterActivity _),
    "q47_grouping_sets" -> (Relational.groupingSetsRevenue _),
    "q48_text_clean" -> (Prep.textClean _),
    "q49_quality_filter" -> (Prep.qualityFilter _),
    "q50_stratified_sample" -> (Prep.stratifiedSample _),
    "q51_bigram_lm" -> (Prep.bigramLm _),
    "q52_dedup_embedding" -> (Dedup.embeddingNearDup _),
    "q53_repetition_ratio" -> (Prep.repetitionRatios _),
    "q54_pii_scrub" -> (Prep.piiScrub _),
    "q55_contamination" -> (Dedup.contamination _),
    "q56_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "q57_tfidf_topk" -> ((s, d) => Corpus.tfidfTopTerms(s, d)),
    "q58_freq_spectrum" -> (Corpus.freqSpectrum _),
    "q59_chunking" -> ((s, d) => Prep.chunk(s, d)),
    "q60_lm_score" -> (Prep.lmScore _),
    // oracle: the fixed iters=2 Lloyd loop unrolled into a CTE chain
    // (see the q61 oracleSql entry); semantics also verified by
    // SimilaritySpec's planted-cluster recall + determinism tests
    "q61_ann_ivf_trained" -> ((s, d) => Similarity.annIvfTrained(s, d)),
    "q62_rolling_revenue" -> (Advanced.rollingRevenue _),
    "q63_gap_fill_daily" -> (Advanced.gapFillDaily _),
    "q64_funnel_stages" -> (Advanced.funnelStages _),
    "q65_props_extract" -> (Advanced.propsExtract _),
    "q66_mixture_sample" -> (Prep.mixtureSample _),
    "q67_cohort_retention" -> (Advanced.cohortRetention _),
    "q68_curated_readback" -> (Prep.curatedReadback _),
    "q69_mm_png_roundtrip" -> (Multimodal.pngRoundtrip _),
    "q70_bucketed_join" -> ((s, d) => Warehouse.bucketedJoinRevenue(s, d)),
    "q71_salted_skew_join" -> ((s, d) => Advanced.saltedSkewJoin(s, d)),
    "q72_mm_wav_roundtrip" -> (Multimodal.wavRoundtrip _),
    "q73_pack_sequences" -> ((s, d) => Prep.packSequences(s, d)),
    "q74_boilerplate_ngrams" -> ((s, d) => Dedup.boilerplate(s, d)),
    "q75_scd2_history" -> (Warehouse.scd2History _),
    "q76_zorder_readback" -> ((s, d) => Warehouse.zorderReadback(s, d)),
    "q77_scd2_asof" -> ((s, d) => Warehouse.scd2AsOf(s, d)),
    "q78_inverted_index" -> ((s, d) => Corpus.invertedIndex(s, d)),
    "q79_emb_quantize" -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "q80_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "q81_lang_centroid" -> ((s, d) => Similarity.langCentroids(s, d)),
    "q82_feature_hash_embed" -> ((s, d) => Corpus.featureHashEmbed(s, d)),
    "q83_bigram_lift" -> ((s, d) => Corpus.bigramLift(s, d)),
    "q84_sparse_topk" -> ((s, d) => Similarity.sparseLexicalTopK(s, d)),
    "q85_orc_roundtrip" -> (Prep.orcRoundtrip _),
    "q86_compaction_readback" -> (Warehouse.compactionReadback _),
    "q87_bpe_pairs" -> ((s, d) => Corpus.bpePairCounts(s, d)),
    "q88_length_deciles" -> ((s, d) => Corpus.lengthDeciles(s, d)),
    "q89_schema_evolution" -> (Warehouse.schemaEvolutionReadback _),
    "q90_null_semantics" -> (Relational.nullSemantics _),
    "q91_merge_upsert" -> ((s, d) => Warehouse.mergeUpsert(s, d)),
    "q92_snapshot_diff" -> ((s, d) => Warehouse.snapshotDiff(s, d)),
    "q93_unpivot_metrics" -> ((s, d) => Relational.unpivotMetrics(s, d)),
    "q94_ngram_novelty" -> ((s, d) => Dedup.ngramNovelty(s, d)),
    "q95_fk_integrity" -> (Quality.fkIntegrity _),
    "q96_column_profile" -> (Quality.columnProfile _),
    "q97_regression_stats" -> ((s, d) => Advanced.regressionStats(s, d)),
    "q98_price_histogram" -> ((s, d) => Advanced.priceHistogram(s, d)),
    "q99_fuzzy_match" -> ((s, d) => Dedup.fuzzyNameMatch(s, d)),
    "q100_length_gini" -> ((s, d) => Corpus.lengthGini(s, d)),
    "q101_rolling_wau" -> ((s, d) => Advanced.rollingActiveUsers(s, d)),
    "q102_event_throttle" -> ((s, d) => Advanced.throttleEvents(s, d)),
    "q103_conversion_latency" -> ((s, d) => Advanced.conversionLatency(s, d)),
    "q104_json_roundtrip" -> (Prep.jsonRoundtrip _),
    "q105_prefix_simjoin" -> ((s, d) => Dedup.prefixSimJoin(s, d)),
    "q106_incremental_rollup" -> ((s, d) => Warehouse.incrementalRollup(s, d)),
    "q107_revenue_anomaly" -> ((s, d) => Advanced.revenueAnomaly(s, d)),
    "q108_mom_growth" -> ((s, d) => Advanced.momGrowth(s, d)),
    "q109_event_transitions" -> ((s, d) => Advanced.eventTransitions(s, d)),
    "q110_basket_pairs" -> ((s, d) => Advanced.basketPairs(s, d)),
    "q111_concurrent_sessions" -> ((s, d) => Advanced.concurrentSessions(s, d)),
    "q112_containment_join" -> ((s, d) => Dedup.containmentJoin(s, d)),
    "q113_session_time_weighted" -> ((s, d) => Advanced.sessionTimeWeighted(s, d)),
    "q114_copurchase_rank" -> ((s, d) => Advanced.copurchaseRank(s, d)),
    "q115_pareto_frontier" -> ((s, d) => Advanced.paretoFrontier(s, d)),
    "q116_max_drawdown" -> ((s, d) => Advanced.maxDrawdown(s, d)),
    "q117_modal_event_type" -> ((s, d) => Advanced.modalEventType(s, d)),
    "q118_interval_merge" -> ((s, d) => Advanced.mergeIntervals(s, d)),
    "q119_activity_streaks" -> ((s, d) => Advanced.activityStreaks(s, d)),
    "q120_allocate_cents" -> ((s, d) => Advanced.allocateProportional(s, d)),
    "q121_triangle_counts" -> ((s, d) => Advanced.triangleCounts(s, d)),
    "q122_systematic_sample" -> ((s, d) => Advanced.systematicSample(s, d)),
    "q123_month_end_balance" -> ((s, d) => Warehouse.monthEndBalance(s, d)),
    "q124_quantile_normalize" -> ((s, d) => Corpus.quantileNormalize(s, d)),
    "q125_session_paths" -> ((s, d) => Advanced.sessionPaths(s, d)),
    "q126_winsorized_length" -> ((s, d) => Quality.winsorizedLength(s, d)),
    "q127_length_mad" -> ((s, d) => Quality.lengthMad(s, d)),
    "q128_benford_audit" -> ((s, d) => Quality.benfordAudit(s, d)),
    "q129_growth_accounting" -> ((s, d) => Advanced.growthAccounting(s, d)),
    "q130_state_dwell" -> ((s, d) => Advanced.stateDwell(s, d)),
    "q131_rfm_segments" -> ((s, d) => Advanced.rfmSegments(s, d)),
    "q132_ship_lag" -> ((s, d) => Advanced.shipLagPercentiles(s, d)),
    "q133_abc_classification" -> ((s, d) => Advanced.abcClassification(s, d)),
    "q134_duplicate_charges" -> ((s, d) => Advanced.duplicateCharges(s, d)),
    "q135_local_supplier_revenue" -> ((s, d) => Relational.localSupplierRevenue(s, d)),
    "q136_market_share" -> ((s, d) => Relational.marketShare(s, d)),
    "q137_part_velocity" -> ((s, d) => Relational.partVelocity(s, d)),
    "q138_order_reconciliation" -> ((s, d) => Quality.orderReconciliation(s, d)),
    "q139_weekday_profile" -> ((s, d) => Advanced.weekdayProfile(s, d)),
    "q140_quantile_codebook" -> ((s, d) => Similarity.quantileCodebook(s, d)),
    "q141_five_number" -> ((s, d) => Quality.fiveNumber(s, d)),
    "q142_iqr_outliers" -> ((s, d) => Quality.iqrOutliers(s, d)),
    "q143_contingency" -> ((s, d) => Quality.contingency(s, d)),
    "q144_bloom_screen" -> ((s, d) => Dedup.bloomScreen(s, d)),
    "q145_part_family" -> ((s, d) => Relational.partFamilyRollup(s, d)),
    "q146_supplier_standing" -> ((s, d) => Relational.supplierStanding(s, d)),
    "q147_stickiness" -> ((s, d) => Advanced.stickiness(s, d)),
    "q148_order_backlog" -> ((s, d) => Advanced.orderBacklog(s, d)),
    "q149_revenue_concentration" -> ((s, d) => Advanced.revenueConcentration(s, d)),
    "q150_curation_funnel" -> ((s, d) => Prep.curationFunnel(s, d)),
    "q151_open_order_aging" -> ((s, d) => Warehouse.openOrderAging(s, d)),
    "q152_return_rates" -> ((s, d) => Warehouse.returnRates(s, d)),
    "q153_supply_risk" -> ((s, d) => Warehouse.supplyRisk(s, d)),
    "q154_purchase_regularity" -> ((s, d) => Advanced.purchaseRegularity(s, d)),
    "q155_price_band_mix" -> ((s, d) => Advanced.priceBandMix(s, d)),
    "q156_ltv_curve" -> ((s, d) => Advanced.ltvCurve(s, d)),
    "q157_shipment_stagger" -> ((s, d) => Warehouse.shipmentStagger(s, d)),
    "q158_cross_sell" -> ((s, d) => Advanced.crossSellMatrix(s, d)),
    "q159_split_balance" -> ((s, d) => Advanced.splitBalance(s, d)),
    "q160_lang_concentration" -> ((s, d) => Corpus.langConcentration(s, d)),
    "q161_lorenz_curve" -> ((s, d) => Advanced.lorenzCurve(s, d)),
    "q162_repurchase_cycle" -> ((s, d) => Advanced.repurchaseCycle(s, d)),
    "q163_sla_compliance" -> ((s, d) => Warehouse.slaCompliance(s, d)),
    "q164_dormant_parts" -> ((s, d) => Warehouse.dormantParts(s, d)),
    "q165_basket_sizes" -> ((s, d) => Warehouse.basketSizes(s, d)),
    "q166_supplier_scorecard" -> ((s, d) => Warehouse.supplierScorecard(s, d)),
    "q167_discount_effect" -> ((s, d) => Warehouse.discountEffect(s, d)),
    "q168_volume_anomalies" -> ((s, d) => Advanced.volumeAnomalies(s, d)),
    "q169_trade_flows" -> ((s, d) => Relational.tradeFlows(s, d)),
    "q170_seasonality_index" -> ((s, d) => Warehouse.seasonalityIndex(s, d)),
    "q171_type_token_ratio" -> ((s, d) => Corpus.typeTokenRatio(s, d)),
    "q172_category_breadth" -> ((s, d) => Advanced.categoryBreadth(s, d)),
    "q173_median_order_trend" -> ((s, d) => Advanced.medianOrderTrend(s, d)),
    "q174_vocab_growth" -> ((s, d) => Corpus.vocabGrowth(s, d)),
    "q175_lag_by_basket" -> ((s, d) => Warehouse.lagByBasketSize(s, d)),
    "q176_weekend_mix" -> ((s, d) => Warehouse.weekendMix(s, d)),
    "q177_negative_balances" -> ((s, d) => Warehouse.negativeBalances(s, d)),
    "q178_engagement_diversity" -> ((s, d) => Advanced.engagementDiversity(s, d)),
    "q179_gap_histogram" -> ((s, d) => Advanced.gapHistogram(s, d)),
    "q180_size_revenue_corr" -> ((s, d) => Advanced.sizeRevenueCorr(s, d)),
    "q181_brand_share" -> ((s, d) => Relational.brandShare(s, d)),
    "q182_line_dominance" -> ((s, d) => Relational.lineDominance(s, d)),
    "q183_export_diversity" -> ((s, d) => Relational.supplierExportDiversity(s, d)),
    "q184_acquisition_curve" -> ((s, d) => Advanced.acquisitionCurve(s, d)),
    "q185_arpu_trend" -> ((s, d) => Advanced.arpuTrend(s, d)),
    "q186_pre_transition_dwell" -> ((s, d) => Advanced.preTransitionDwell(s, d)),
    "q187_char_class_profile" -> ((s, d) => Corpus.charClassProfile(s, d)),
    "q188_qty_by_price_band" -> ((s, d) => Advanced.quantityByPriceBand(s, d)),
    "q189_expansion_cohorts" -> ((s, d) => Advanced.expansionCohorts(s, d)),
    "q190_oov_rate" -> ((s, d) => Corpus.oovRate(s, d)),
    "q191_semantic_decontam" -> ((s, d) => Similarity.semanticDecontam(s, d)),
    "q192_incremental_mv" -> ((s, d) => Warehouse.incrementalMv(s, d)),
    "q193_domain_cap" -> ((s, d) => Prep.domainCap(s, d)),
    "q194_mixture_weights" -> ((s, d) => Prep.mixtureWeights(s, d)),
    "q195_canonical_docs" -> ((s, d) => Dedup.canonicalDocs(s, d)),
    "q196_dup_spans" -> ((s, d) => Dedup.dupSpans(s, d)),
    "q197_heavy_hitters" -> ((s, d) => Corpus.heavyHitters(s, d)),
    "q198_delta_dedup" -> ((s, d) => Dedup.deltaDedup(s, d)),
    "q199_vocab_coverage" -> ((s, d) => Corpus.vocabCoverage(s, d)),
    "q200_lsh_recall_audit" -> ((s, d) => Dedup.lshRecallAudit(s, d)),
    "q201_corpus_neardup_probe" -> ((s, d) => Dedup.corpusNearDupProbe(s, d)),
    "q202_contract_monitor" -> ((s, d) => Quality.contractMonitor(s, d)),
    "q203_dsir_weights" -> ((s, d) => Prep.dsirWeights(s, d)),
    "q204_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "q205_source_divergence" -> ((s, d) => Corpus.sourceDivergence(s, d)),
    "q206_cluster_keywords" -> ((s, d) => Similarity.clusterKeywords(s, d)),
    "q207_drift_monitor" -> ((s, d) => Quality.driftMonitor(s, d)),
    "q208_cluster_purity" -> ((s, d) => Similarity.clusterPurity(s, d)),
    "q209_daily_uniques" -> ((s, d) => Quality.dailyUniques(s, d)),
    "q210_bpe_learn" -> ((s, d) => Corpus.bpeLearn(s, d)),
    "q211_bpe_tokenize" -> ((s, d) => Corpus.bpeTokenize(s, d)),
    "q212_pq_encode" -> ((s, d) => Similarity.pqEncode(s, d)),
    "q213_pq_adc_topk" -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "q214_coreset_coverage" -> ((s, d) => Similarity.coresetCoverage(s, d)),
    "q215_jl_distortion" -> ((s, d) => Similarity.jlDistortion(s, d)),
    "q216_filter_sweep" -> ((s, d) => Prep.filterSweep(s, d)),
    "q217_dedup_sweep" -> ((s, d) => Dedup.dedupSweep(s, d)),
    "q218_pq_staleness" -> ((s, d) => Similarity.pqStaleness(s, d)),
    "q219_skew_profile" -> ((s, d) => Quality.skewProfile(s, d)),
    "q220_join_cardinality" -> ((s, d) => Quality.joinCardinality(s, d)),
    "q221_embedding_hygiene" -> ((s, d) => Similarity.embeddingHygiene(s, d)),
    "q222_lsh_cost_planner" -> ((s, d) => Dedup.lshCostPlanner(s, d)),
    "q223_source_manifest" -> ((s, d) => Corpus.sourceManifest(s, d)),
    "q224_curriculum_order" -> ((s, d) => Prep.curriculumOrder(s, d)),
    "q225_shard_plan" -> ((s, d) => Similarity.shardPlan(s, d)),
    "q226_langid_confusion" -> ((s, d) => TextAnalysis.langidConfusion(s, d)),
    "q227_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(s, d)),
    // oracle: q223's full-corpus card — the incremental merge must be
    // bit-identical to the recompute
    "q228_manifest_merge" -> ((s, d) => Corpus.manifestMerge(s, d)),
    "q229_embedding_covariance" -> ((s, d) => Similarity.embeddingCovariance(s, d)),
    "q230_pca_power" -> ((s, d) => Similarity.pcaPower(s, d)),
    "q231_modality_alignment" -> ((s, d) => Similarity.modalityAlignment(s, d)),
    "q232_group_kfold" -> ((s, d) => Prep.groupKFold(s, d)),
    "q233_rebalance_plan" -> ((s, d) => Prep.rebalancePlan(s, d)),
    "q234_split_leakage" -> ((s, d) => Dedup.splitLeakage(s, d)),
    "q235_ivf_recall" -> ((s, d) => Similarity.ivfRecallAudit(s, d)),
    "q236_lm_fluency" -> ((s, d) => Corpus.lmFluency(s, d)),
    "q237_repetition_profile" -> ((s, d) => Corpus.repetitionProfile(s, d)),
    "q238_key_overlap" -> ((s, d) => Quality.keyOverlapSketch(s, d)),
    "q239_price_quantile_sketch" -> ((s, d) => Quality.priceQuantileSketch(s, d)),
    "q240_daily_value_quantiles" -> ((s, d) => Quality.dailyValueQuantiles(s, d)),
    "q241_mass_estimate" -> ((s, d) => Quality.massEstimate(s, d)),
    "q242_bm25_topdocs" -> ((s, d) => Corpus.bm25TopDocs(s, d)),
    "q243_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "q244_source_ols" -> ((s, d) => Quality.sourceOlsFit(s, d)),
    "q245_nb_confusion" -> ((s, d) => Corpus.nbConfusion(s, d)),
    "q246_score_auc" -> ((s, d) => Quality.scoreAuc(s, d)),
    "q247_calibration_bins" -> ((s, d) => Quality.calibrationBins(s, d)),
    "q248_cm_freq_audit" -> ((s, d) => Corpus.cmFrequencyAudit(s, d)),
    "q249_zipf_slope" -> ((s, d) => Corpus.zipfSlope(s, d)),
    "q250_reciprocal_nn" -> ((s, d) => Similarity.reciprocalNn(s, d)),
    "q251_cdc_chunks" -> ((s, d) => Dedup.cdcChunks(s, d)),
    "q252_youden_threshold" -> ((s, d) => Quality.youdenThreshold(s, d)),
    "q253_dpp_revenue" -> ((s, d) => Warehouse.dppPrunedRevenue(s, d)),
    "q254_lm_affinity" -> ((s, d) => Corpus.lmAffinity(s, d)),
    "q255_dup_assortativity" -> ((s, d) => Dedup.dupAssortativity(s, d)),
    "q256_decile_lift" -> ((s, d) => Quality.decileLift(s, d)),
    "q257_exact_substring" -> ((s, d) => Dedup.exactSubstringDedup(s, d)),
    "q258_cdc_ingest_probe" -> ((s, d) => Dedup.cdcIngestProbe(s, d)),
    "q259_exact_scrub" -> ((s, d) => Dedup.exactSubstringScrub(s, d)),
    "q260_chunk_flow" -> ((s, d) => Dedup.chunkFlowMatrix(s, d)),
    "q261_effective_tokens" -> ((s, d) => Prep.effectiveTokens(s, d)),
    "q262_kappa_agreement" -> ((s, d) => Quality.kappaAgreement(s, d)),
    "q263_pack_sweep" -> ((s, d) => Prep.packSweep(s, d)),
    "q264_cluster_split" -> ((s, d) => Prep.clusterSplit(s, d)),
    "q265_kn_fluency" -> ((s, d) => Corpus.knFluency(s, d)),
    "q266_shard_manifest" -> ((s, d) => Prep.shardManifest(s, d)),
    "q267_epoch_plan" -> ((s, d) => Prep.epochPlan(s, d)),
    "q268_neyman_alloc" -> ((s, d) => Quality.neymanAllocation(s, d)),
    "q269_blocklist_screen" -> ((s, d) => Prep.blocklistScreen(s, d)),
    "q270_margin_pairs" -> ((s, d) => Similarity.marginPairs(s, d)),
    "q271_centroid_outliers" -> ((s, d) => Similarity.centroidOutliers(s, d)),
    "q272_admission_audit" -> ((s, d) => Prep.admissionAudit(s, d)),
    "q273_signal_agreement" -> ((s, d) => Quality.signalAgreement(s, d)),
    "q274_substring_probe" -> ((s, d) => Dedup.exactSubstringProbe(s, d)),
    "q275_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q276_gdpr_erase" -> ((s, d) => Warehouse.gdprErase(s, d)),
    "q277_image_dhash_dups" -> ((s, d) => Multimodal.imageDHashDups(s, d)),
    "q278_audio_fp_dups" -> ((s, d) => Multimodal.audioFpDups(s, d)),
    "q279_scene_cuts" -> ((s, d) => Multimodal.sceneCuts(s, d)),
    "q280_dup_evidence" -> ((s, d) => Multimodal.dupEvidence(s, d)),
    "q281_clip_dups" -> ((s, d) => Multimodal.clipDups(s, d)),
    "q282_k_anonymity" -> ((s, d) => Quality.kAnonymityAudit(s, d)),
    "q283_pagerank" -> ((s, d) => Advanced.copurchasePageRank(s, d)),
    "q284_audio_vad" -> ((s, d) => Multimodal.audioVad(s, d)),
    "q285_budget_select" -> ((s, d) => Prep.budgetSelect(s, d)),
    "q286_dedup_mixture" -> ((s, d) => Prep.dedupMixture(s, d)),
    "q287_target_mixture" -> ((s, d) => Prep.targetMixture(s, d)),
    "q288_diverse_select" -> ((s, d) => Similarity.diverseSelect(s, d)),
    "q289_decontam_scrub" -> ((s, d) => Dedup.decontamScrub(s, d)),
    "q290_isotonic_rate" -> ((s, d) => Quality.isotonicCalibration(s, d)),
    "q291_code_switch" -> ((s, d) => TextAnalysis.codeSwitchProfile(s, d)),
    "q292_authority_canon" -> ((s, d) => Dedup.authorityCanon(s, d)),
    "q293_retention_sweep" -> ((s, d) => Warehouse.retentionSweep(s, d)),
    // q200 at threshold 0.5 — the second operating point of the recall/
    // precision audit: a lower threshold admits a much larger truth set
    // and a dirtier candidate stream, so a band-math regression that
    // explodes candidates (or silently narrows them) moves THIS row even
    // when the 0.8 row stays green
    "q294_lsh_recall_audit_t05" -> ((s, d) =>
      Dedup.lshRecallAudit(Tables.documents(s, d),
        bands = 4, rowsPerBand = 2, threshold = 0.5, auditCap = 1000)),
    // q295: incremental maintenance of the standing pair relation — the
    // oracle is q22's FULL-recompute SQL verbatim, so the hash match
    // proves pairs(corpus)∪pairs(delta)∪cross(delta⋈corpus) equals the
    // from-scratch mining exactly
    "q295_delta_pair_update" -> ((s, d) => Dedup.deltaPairUpdate(s, d)),
    // q296: q295's embedding-side twin — the codebook trains once per
    // generation on the standing corpus tier and serves from the derived
    // store; ingest assignment touches the 5% delta only
    "q296_delta_assign" -> ((s, d) => Similarity.deltaAssign(s, d)),
    // q297: exact MRR/recall of cosine retrieval against the
    // embeddings' class labels — the space-quality eval the semantic
    // dedup / diversity / hard-negative operators all inherit
    "q297_retrieval_eval" -> ((s, d) => Similarity.retrievalEval(s, d)),
    // q298: the retrain trigger for the q296 serving pattern — per-cell
    // cosine between the standing (corpus-tier) codebook and today's
    // full retrain; both codebooks are shared derived artifacts, the
    // audit itself is an nCells-row join
    "q298_codebook_drift" -> ((s, d) => Similarity.codebookDrift(s, d)),
    // q299: the report above q289's scrub — per (train source, eval
    // source) cell: contaminated docs, matched windows, merged-island
    // token mass. Hot row = a crawler scraping benchmarks; hot column =
    // a leaked benchmark.
    "q299_contamination_matrix" -> ((s, d) => Dedup.contaminationMatrix(s, d)),
    // q300: q299's LSH-verified twin — whole-document near-dups crossing
    // the eval boundary per source cell (a paraphrased benchmark copy
    // carries no exact window but still poisons the eval); two key-only
    // lookups + a |sources|²-row aggregate over the shared q22 artifact
    "q300_neardup_contamination" -> ((s, d) => Dedup.nearDupContamination(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  private val q277OracleSql: String =
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id >= 1 AND doc_id % 17 = 3 THEN doc_id - 1 ELSE doc_id END AS base,
        |    (doc_id >= 1 AND doc_id % 17 = 3) AS planted
        |  FROM documents
        |), dims AS (
        |  SELECT doc_id, base, planted,
        |    16 + base % 48 AS w, 16 + (base * 7) % 48 AS h
        |  FROM ids
        |), px AS (
        |  SELECT d.doc_id,
        |    (9 * x.x + 8) // d.w AS ci, (8 * y.y + 7) // d.h AS cj,
        |    ( (CASE WHEN d.planted THEN ((x.x*31 + y.y*17 + d.base) % 256 + 6) % 256
        |            ELSE (x.x*31 + y.y*17 + d.base) % 256 END)
        |    + (CASE WHEN d.planted THEN ((x.x*13 + y.y*29 + d.base*3) % 256 + 6) % 256
        |            ELSE (x.x*13 + y.y*29 + d.base*3) % 256 END)
        |    + (CASE WHEN d.planted THEN ((x.x*7 + y.y*11 + d.base*5) % 256 + 6) % 256
        |            ELSE (x.x*7 + y.y*11 + d.base*5) % 256 END) ) // 3 AS gray
        |  FROM dims d, range(0, 63) x(x), range(0, 63) y(y)
        |  WHERE x.x < d.w AND y.y < d.h
        |), cells AS (
        |  SELECT doc_id, ci, cj, SUM(gray) // COUNT(*) AS cv
        |  FROM px GROUP BY 1, 2, 3
        |), bits AS (
        |  SELECT a.doc_id, a.cj * 8 + a.ci AS pos
        |  FROM cells a JOIN cells b
        |    ON b.doc_id = a.doc_id AND b.cj = a.cj AND b.ci = a.ci + 1
        |  WHERE a.ci <= 7 AND b.cv > a.cv
        |), hashes AS (
        |  -- the SUM is HUGEINT; cast back to the signed-64 domain or a
        |  -- negative hash drags 64 sign-extension bits into bit_count
        |  SELECT i.doc_id, CAST(COALESCE(s.hsh, 0) AS BIGINT) AS dhash
        |  FROM ids i LEFT JOIN (
        |    SELECT doc_id, SUM(CASE WHEN pos = 63 THEN -9223372036854775807 - 1
        |                            ELSE (CAST(1 AS BIGINT) << pos) END) AS hsh
        |    FROM bits GROUP BY 1) s ON s.doc_id = i.doc_id
        |), bandk AS (
        |  SELECT h.doc_id, h.dhash, b.b, (h.dhash >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (h.dhash >> (16 * b.b)) & 65535
        |                       ORDER BY h.doc_id) AS rn
        |  FROM hashes h, range(0, 4) b(b)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    x.dhash AS ha, y.dhash AS hb
        |  FROM bandk x JOIN bandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 10""".stripMargin

  private val q278OracleSql: String =
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id >= 1 AND doc_id % 19 = 5 THEN doc_id - 1 ELSE doc_id END AS base,
        |    (doc_id >= 1 AND doc_id % 19 = 5) AS planted
        |  FROM documents
        |), dims AS (
        |  SELECT doc_id, base, planted, 256 + base % 512 AS n FROM ids
        |), smp AS (
        |  SELECT doc_id, (65 * t + 64) // n AS f,
        |    ABS(CASE WHEN planted THEN v - (v >> 4) ELSE v END) AS av
        |  FROM (
        |    SELECT d.doc_id, d.planted, d.n, t.t AS t,
        |      CAST(( (d.base * 25173 % 65536 + t.t * 13849) % 65536
        |           + (d.base * 12289 % 65536 + t.t * 31397) % 65536 ) % 65536
        |           - 32768 AS BIGINT) AS v
        |    FROM dims d, range(0, 768) t(t) WHERE t.t < d.n
        |  )
        |), frames AS (
        |  SELECT doc_id, f, SUM(av) // COUNT(*) AS fv FROM smp GROUP BY 1, 2
        |), bits AS (
        |  SELECT a.doc_id, a.f AS pos
        |  FROM frames a JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        |  WHERE a.f <= 63 AND b.fv > a.fv
        |), hashes AS (
        |  SELECT i.doc_id, CAST(COALESCE(s.hsh, 0) AS BIGINT) AS afp
        |  FROM ids i LEFT JOIN (
        |    SELECT doc_id, SUM(CASE WHEN pos = 63 THEN -9223372036854775807 - 1
        |                            ELSE (CAST(1 AS BIGINT) << pos) END) AS hsh
        |    FROM bits GROUP BY 1) s ON s.doc_id = i.doc_id
        |), bandk AS (
        |  SELECT h.doc_id, h.afp, b.b, (h.afp >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (h.afp >> (16 * b.b)) & 65535
        |                       ORDER BY h.doc_id) AS rn
        |  FROM hashes h, range(0, 4) b(b)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    x.afp AS ha, y.afp AS hb
        |  FROM bandk x JOIN bandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4""".stripMargin

  private val q281OracleSql: String =
      """WITH cdims AS (
        |  SELECT doc_id,
        |    (doc_id >= 1 AND doc_id % 23 = 7) AS planted,
        |    CASE WHEN doc_id >= 1 AND doc_id % 23 = 7 THEN doc_id - 1 ELSE doc_id END AS base
        |  FROM documents
        |), cframes AS (
        |  SELECT doc_id, planted, base,
        |    CASE WHEN planted THEN 1 + base % 7 ELSE 2 + base % 7 END AS nf
        |  FROM cdims
        |), cpx AS (
        |  -- the trimmed twin's frame f is the base clip's frame f+1, +2
        |  -- brightness; pixel = multiply-xorshift-multiply hash of
        |  -- (base, scene, raster index), replayed arithmetic-for-arithmetic
        |  SELECT d.doc_id, f.f AS f, i.i AS i,
        |    CAST(CASE WHEN d.planted THEN f.f + 1 ELSE f.f END AS BIGINT) AS bf,
        |    (bf // 3) AS p,
        |    ((d.base * 2654435761 + p * 40503) % 2147483648 * 48271) % 2147483647 AS seed,
        |    (seed + (i.i + 1) * 69621) % 2147483647 AS v1,
        |    (v1 * 16807) % 2147483647 AS v2,
        |    xor(v2, v2 >> 16) AS v3,
        |    (v3 * 48271) % 2147483647 AS v4,
        |    (v4 % 256 + 3 * bf + CASE WHEN d.planted THEN 2 ELSE 0 END) % 256 AS g
        |  FROM cframes d, range(0, 8) f(f), range(0, 64) i(i)
        |  WHERE f.f < d.nf
        |), cbits AS (
        |  SELECT a.doc_id, a.f, a.i AS pos
        |  FROM cpx a JOIN cpx b ON b.doc_id = a.doc_id AND b.f = a.f AND b.i = a.i + 1
        |  WHERE a.i <= 62 AND b.g > a.g
        |), cfps AS (
        |  SELECT d.doc_id, fr.f AS frame, COALESCE(CAST(s.h AS BIGINT), 0) AS fp
        |  FROM cframes d JOIN range(0, 8) fr(f) ON fr.f < d.nf
        |  LEFT JOIN (SELECT doc_id, f, SUM(CAST(1 AS BIGINT) << pos) AS h
        |             FROM cbits GROUP BY 1, 2) s
        |    ON s.doc_id = d.doc_id AND s.f = fr.f
        |), cmarked AS (
        |  SELECT doc_id, frame, fp,
        |    CASE WHEN LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame) IS NULL THEN 999
        |         ELSE bit_count(xor(fp, LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame))) END
        |      AS hamming_prev
        |  FROM cfps
        |), csig AS (
        |  -- scene keyframes: frame 0 or a Hamming jump > 8 (q279's rule)
        |  SELECT doc_id, fp,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame) AS scene
        |  FROM cmarked WHERE hamming_prev = 999 OR hamming_prev > 8
        |), cpacks AS (
        |  SELECT doc_id, COUNT(*) AS n FROM csig GROUP BY 1
        |), cbandk AS (
        |  SELECT s.doc_id, s.fp, b.b, (s.fp >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (s.fp >> (16 * b.b)) & 65535
        |                       ORDER BY s.doc_id, s.fp) AS rn
        |  FROM csig s, range(0, 4) b(b)
        |), ccand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM cbandk x JOIN cbandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |  WHERE x.doc_id < y.doc_id
        |), cmatched AS (
        |  -- per-element EXISTS: an element of a's signature matches if
        |  -- SOME element of b's is within Hamming 10
        |  SELECT doc_a, doc_b, COUNT(*) AS m FROM (
        |    SELECT DISTINCT c.doc_a, c.doc_b, sa.scene
        |    FROM ccand c
        |    JOIN csig sa ON sa.doc_id = c.doc_a
        |    JOIN csig sb ON sb.doc_id = c.doc_b
        |     AND bit_count(xor(sa.fp, sb.fp)) <= 10
        |  ) GROUP BY 1, 2
        |)
        |SELECT m.doc_a, m.doc_b,
        |  CAST(pa.n AS INT) AS n_a, CAST(pb.n AS INT) AS n_b,
        |  CAST(m.m AS INT) AS matched
        |FROM cmatched m
        |JOIN cpacks pa ON pa.doc_id = m.doc_a
        |JOIN cpacks pb ON pb.doc_id = m.doc_b
        |WHERE 2 * m.m >= GREATEST(pa.n, pb.n)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_extendedprice AS price
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q02_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_join_enrich_broadcast" ->
      """SELECT event_id, user_id, event_type, value, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,

    "q04_join_multi_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q05_status_bands" ->
      """SELECT event_id, user_id, event_type, value, c_name, n_name,
        |  CASE WHEN value > c_acctbal THEN 'OVER'
        |       WHEN c_acctbal - value < 100 THEN 'NEAR'
        |       ELSE 'UNDER' END AS acct_status,
        |  CASE WHEN value < 50 THEN 'LOW'
        |       WHEN value < 150 THEN 'MID'
        |       ELSE 'HIGH' END AS value_band,
        |  CASE WHEN value = 0 THEN 'DEAD' ELSE 'ALIVE' END AS liveness
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "q06_latest_state_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "q07_row_to_json" ->
      """SELECT event_id,
        |  CAST(to_json(struct_pack(event_id := event_id, user_id := user_id, event_type := event_type)) AS VARCHAR) AS payload
        |FROM events""".stripMargin,

    "q08_cast_projection" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(c_nationkey AS BIGINT) AS nation_big,
        |  CAST(c_acctbal AS VARCHAR) AS bal_str
        |FROM customer""".stripMargin,

    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q10_semi_join_active" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q11_anti_join_dormant" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q12_distinct_user_events" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q13_window_tumbling_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q14_union_high_low" ->
      """SELECT user_id, bucket, COUNT(*) AS n FROM (
        |  SELECT user_id, 'high' AS bucket FROM events WHERE value >= 200
        |  UNION ALL
        |  SELECT user_id, 'low' AS bucket FROM events WHERE value < 20
        |) GROUP BY user_id, bucket""".stripMargin,

    "q15_sessionize" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM w
        |), g AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, session_seq""".stripMargin,

    "q16_text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_re_tokens
        |FROM documents""".stripMargin,

    "q17_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m, len(string_split(text, ' ')) AS n_words,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) AS punct_ratio
        |FROM documents""".stripMargin,

    "q18_text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labelled, string_split(text, ' ') AS w FROM documents
        |), sc AS (
        |  SELECT doc_id, labelled,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','que','los'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('le','les','des','et','une'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS s_de
        |  FROM t
        |)
        |SELECT doc_id, labelled,
        |  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
        |       ELSE 'de' END AS predicted
        |FROM sc""".stripMargin,

    "q19_text_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q20_dedup_exact" ->
      "SELECT md5(text) AS fp, min(doc_id) AS keeper, COUNT(*) AS n FROM documents GROUP BY md5(text)",

    "q21_dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin,

    "q22_dedup_minhash_lsh" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |FROM verified
        |WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8""".stripMargin,

    "q23_dedup_simhash" ->
      """WITH wd AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents
        |), bits AS (
        |  SELECT doc_id, j,
        |    SUM((((instr('0123456789abcdef', substr(md5(w), CAST(j // 4 AS INT) + 1, 1)) - 1) >> CAST(3 - (j % 4) AS INT)) & 1) * 2 - 1) AS votes
        |  FROM wd, range(0, 32) t(j) GROUP BY doc_id, j
        |)
        |SELECT doc_id, string_agg(CASE WHEN votes >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,

    "q24_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
        |), pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != q.query_id
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT query_id, neighbor_id, CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cosine FROM pairs
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM c
        |) WHERE "rank" <= 10""".stripMargin,

    "q25_emb_neardup_lsh" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE))) AS cosine
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |)
        |SELECT vec_a, vec_b, cosine FROM cos WHERE cosine >= 0.4""".stripMargin,

    // q26: the Spark side sniffs real container magic bytes and reads
    // dimensions/frame counts out of the actual PNG/GIF/WAVE structures
    // (header-only, javax.imageio/javax.sound); the oracle recomputes
    // them from the synthesis closed forms per modality.
    "q26_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'wav' END AS container,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(16 + doc_id % 48 AS INT)
        |                  WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS width,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(16 + (doc_id * 7) % 48 AS INT)
        |                  WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS height,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(1 AS INT)
        |                  WHEN 1 THEN CAST(1 + doc_id % 8 AS INT)
        |                  ELSE CAST(256 + doc_id % 512 AS INT) END AS n_frames
        |FROM documents""".stripMargin,

    // q27: full real decode per modality — PNG pixel sums (q69's closed
    // form), GIF pixel sums across ALL frames (q37's form summed over
    // the frame axis), WAVE abs-sample sums (q72's form) — unioned.
    "q27_multimodal_decode" ->
      """WITH png AS (
        |  SELECT doc_id, CAST(16 + doc_id % 48 AS INT) AS width,
        |    CAST(16 + (doc_id * 7) % 48 AS INT) AS height
        |  FROM documents WHERE doc_id % 3 = 0
        |), png_sum AS (
        |  SELECT p.doc_id, 'png' AS format, p.width, p.height, CAST(1 AS INT) AS frames,
        |    CAST(SUM( (x * 31 + y * 17 + p.doc_id) % 256
        |            + (x * 13 + y * 29 + p.doc_id * 3) % 256
        |            + (x * 7 + y * 11 + p.doc_id * 5) % 256) AS BIGINT) AS content_sum
        |  FROM png p,
        |  LATERAL (SELECT unnest(range(0, p.width)) AS x) tx,
        |  LATERAL (SELECT unnest(range(0, p.height)) AS y) ty
        |  GROUP BY 1, 2, 3, 4, 5
        |), gif AS (
        |  SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1
        |), gif_sum AS (
        |  SELECT g.doc_id, 'gif' AS format, CAST(8 AS INT) AS width,
        |    CAST(8 AS INT) AS height, g.n_frames AS frames,
        |    CAST(SUM((x * 31 + y * 17 + g.doc_id + f * 7) % 256) AS BIGINT) AS content_sum
        |  FROM gif g,
        |  LATERAL (SELECT unnest(range(0, g.n_frames)) AS f) tf,
        |  LATERAL (SELECT unnest(range(0, 8)) AS x) tx,
        |  LATERAL (SELECT unnest(range(0, 8)) AS y) ty
        |  GROUP BY 1, 2, 3, 4, 5
        |), wav AS (
        |  SELECT doc_id, CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents WHERE doc_id % 3 = 2
        |), wav_sum AS (
        |  SELECT w.doc_id, 'wav' AS format, CAST(NULL AS INT) AS width,
        |    CAST(NULL AS INT) AS height, w.n_samples AS frames,
        |    CAST(SUM(ABS((w.doc_id * 31 + t * 17) % 65536 - 32768)) AS BIGINT) AS content_sum
        |  FROM wav w,
        |  LATERAL (SELECT unnest(range(0, w.n_samples)) AS t) tt
        |  GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT * FROM png_sum UNION ALL SELECT * FROM gif_sum UNION ALL SELECT * FROM wav_sum""".stripMargin,

    "q38_text_winnow" ->
      """SELECT doc_id,
        |  list_min([md5(substr(text, i, 8)) FOR i IN range(1, greatest(length(text) - 7, 1) + 1)]) AS winnow_fp
        |FROM documents""".stripMargin,

    "q39_vocab_topk" ->
      """SELECT w AS word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q40_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
        |FROM b""".stripMargin,

    "q41_length_quantiles" ->
      """WITH w AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |)
        |SELECT lang,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN n_chars END) AS p25,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN n_chars END) AS p75,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN n_chars END) AS p95,
        |  MAX(n) AS n_docs
        |FROM w GROUP BY lang""".stripMargin,

    // KMV sketch: k-th smallest distinct 48-bit md5 hash per source, estimate
    // by int64 floor division (17732923532771328 = 63 << 48); quantiles are
    // exact discrete percentiles of the deterministic 12% md5-bucket sample.
    // Mirrors graft.functions.KMinValues + Corpus.sketchProfileKmv exactly.
    "q42_sketch_profile" ->
      """WITH tx AS (
        |  SELECT DISTINCT source, md5(text) AS m FROM documents
        |), ht AS (
        |  SELECT DISTINCT source,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM tx, range(0, 12) r(j) GROUP BY source, m
        |), lx AS (
        |  SELECT DISTINCT source, md5(lang) AS m FROM documents
        |), hl AS (
        |  SELECT DISTINCT source,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM lx, range(0, 12) r(j) GROUP BY source, m
        |), kt AS (
        |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS nd
        |  FROM ht
        |), ndv_t AS (
        |  SELECT source,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_text
        |  FROM kt GROUP BY source
        |), kl AS (
        |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS nd
        |  FROM hl
        |), ndv_l AS (
        |  SELECT source,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_lang
        |  FROM kl GROUP BY source
        |), sq AS (
        |  SELECT source, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |  WHERE ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 < 12
        |), quants AS (
        |  SELECT source,
        |    MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS len_p50,
        |    MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN n_chars END) AS len_p95,
        |    MAX(n) AS samp_n
        |  FROM sq GROUP BY source
        |), base AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        |)
        |SELECT b.source, b.n_docs, t.ndv_text, l.ndv_lang, q.len_p50, q.len_p95, q.samp_n
        |FROM base b
        |JOIN ndv_t t USING (source)
        |JOIN ndv_l l USING (source)
        |LEFT JOIN quants q USING (source)""".stripMargin,

    "q43_intersect_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q44_except_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q45_pivot_event_counts" ->
      """SELECT user_id,
        |  NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click_n,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'error' THEN 1 END), 0) AS error_n,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase_n,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS signup_n,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view_n,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_val
        |FROM events GROUP BY user_id""".stripMargin,

    "q46_full_outer_activity" ->
      """SELECT cust, COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events
        |FROM (SELECT o_custkey AS cust, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT user_id AS cust, COUNT(*) AS n_events FROM events GROUP BY 1) e
        |USING (cust)""".stripMargin,

    "q47_grouping_sets" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), (o_orderstatus))""".stripMargin,

    "q48_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
        |  length(text) AS n_raw,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS n_clean
        |FROM documents""".stripMargin,

    "q49_quality_filter" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS w,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) AS punct
        |  FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    [x FOR x IN [
        |      CASE WHEN n_chars < 50 THEN 'too_short' END,
        |      CASE WHEN n_chars > 5000 THEN 'too_long' END,
        |      CASE WHEN len(w) < 10 THEN 'few_words' END,
        |      CASE WHEN mean_len > 12.0 THEN 'long_words' END,
        |      CASE WHEN punct > 0.10 THEN 'high_punct' END] IF x IS NOT NULL] AS reasons
        |  FROM f
        |)
        |SELECT doc_id, len(reasons) = 0 AS keep,
        |  COALESCE(list_aggregate(reasons, 'string_agg', ','), '') AS reasons
        |FROM r""".stripMargin,

    "q50_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100
        |  < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin,

    "q51_bigram_lm" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (
        |  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        |)
        |SELECT bigram, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE) AS p_cond
        |FROM c""".stripMargin,

    "q52_dedup_embedding" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE))) AS cosine
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |)
        |SELECT vec_a AS doc_a, vec_b AS doc_b, cosine, least(vec_a, vec_b) AS keeper
        |FROM cos
        |WHERE cosine >= 0.4
        |  AND vec_a IN (SELECT doc_id FROM documents)
        |  AND vec_b IN (SELECT doc_id FROM documents)""".stripMargin,

    // q36: the Spark side decodes the q69 synthetic PNG, box-downscales
    // 2×2 with integer floor, re-encodes + re-decodes the thumbnail, and
    // sums its pixels; the oracle recomputes the identical integer math
    // from the closed-form source pixels (PNG is lossless), so a hash
    // match proves real resize work on really decoded pixels.
    "q36_mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST((16 + doc_id % 48) // 2 AS INT) AS width,
        |    CAST((16 + (doc_id * 7) % 48) // 2 AS INT) AS height
        |  FROM documents
        |)
        |SELECT d.doc_id, d.width, d.height,
        |  CAST(SUM(
        |    ( ((2*x) * 31 + (2*y) * 17 + d.doc_id) % 256
        |    + ((2*x+1) * 31 + (2*y) * 17 + d.doc_id) % 256
        |    + ((2*x) * 31 + (2*y+1) * 17 + d.doc_id) % 256
        |    + ((2*x+1) * 31 + (2*y+1) * 17 + d.doc_id) % 256 ) // 4
        |  + ( ((2*x) * 13 + (2*y) * 29 + d.doc_id * 3) % 256
        |    + ((2*x+1) * 13 + (2*y) * 29 + d.doc_id * 3) % 256
        |    + ((2*x) * 13 + (2*y+1) * 29 + d.doc_id * 3) % 256
        |    + ((2*x+1) * 13 + (2*y+1) * 29 + d.doc_id * 3) % 256 ) // 4
        |  + ( ((2*x) * 7 + (2*y) * 11 + d.doc_id * 5) % 256
        |    + ((2*x+1) * 7 + (2*y) * 11 + d.doc_id * 5) % 256
        |    + ((2*x) * 7 + (2*y+1) * 11 + d.doc_id * 5) % 256
        |    + ((2*x+1) * 7 + (2*y+1) * 11 + d.doc_id * 5) % 256 ) // 4
        |  ) AS BIGINT) AS px_sum
        |FROM dims d,
        |LATERAL (SELECT unnest(range(0, d.width)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, d.height)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    // q37: the Spark side writes a real multi-frame GIF (256-gray
    // indexed, lossless), decodes it back, and emits every 2nd frame
    // with its decoded pixel sum; the oracle recomputes from the
    // closed-form frame-pixel function.
    "q37_mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS n_frames FROM documents
        |)
        |SELECT f.doc_id, CAST(fi AS INT) AS frame_idx, f.n_frames,
        |  CAST(SUM((x * 31 + y * 17 + f.doc_id + fi * 7) % 256) AS BIGINT) AS px_sum
        |FROM f,
        |LATERAL (SELECT unnest(range(0, f.n_frames, 2)) AS fi) tf,
        |LATERAL (SELECT unnest(range(0, 8)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, 8)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    "q28_rollup_revenue" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin,

    "q29_cube_events" ->
      """SELECT event_type, band, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type,
        |        CASE WHEN value < 50 THEN 'LOW' WHEN value < 150 THEN 'MID' ELSE 'HIGH' END AS band,
        |        value FROM events)
        |GROUP BY CUBE(event_type, band)""".stripMargin,

    "q30_asof_last_order" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderkey) FROM orders o
        |    WHERE o.o_custkey = e.user_id
        |      AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                            WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)) AS last_order_key,
        |  (SELECT max(o2.o_orderdate) FROM orders o2
        |    WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts) AS last_order_date
        |FROM events e""".stripMargin,

    "q31_range_join_bands" ->
      """SELECT event_id, user_id, value, band
        |FROM events
        |JOIN (VALUES ('LOW', 0.0, 50.0), ('MID', 50.0, 150.0), ('HIGH', 150.0, 1e12)) b(band, lo, hi)
        |  ON value >= lo AND value < hi""".stripMargin,

    "q32_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o JOIN (
        |  SELECT o_custkey AS ck, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_tp, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1) s ON o.o_custkey = s.ck
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt > sum_tp""".stripMargin,

    "q33_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,

    "q34_salted_skew_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q35_ann_ivf" ->
      """WITH qn AS (
        |  SELECT e.vec_id, SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS n2
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id AS va, c.vec_id AS vb,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(c.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot
        |  FROM embeddings e JOIN embeddings c ON c.vec_id < 8,
        |  LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.va AS vec_id, d.vb AS cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS ccos
        |  FROM dots d JOIN qn na ON na.vec_id = d.va JOIN qn nb ON nb.vec_id = d.vb
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    SUM(CAST(floor(CAST(eq.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(en.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot
        |  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id JOIN embeddings en ON en.vec_id = c.neighbor_id,
        |  LATERAL (SELECT unnest(range(1, len(eq.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN qn nq ON nq.vec_id = n.query_id JOIN qn nn ON nn.vec_id = n.neighbor_id
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM scored
        |) WHERE "rank" <= 5""".stripMargin,

    "q53_repetition_ratio" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), b AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) >= 2 THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
        |         ELSE [] END AS bg
        |  FROM t
        |)
        |SELECT doc_id, len(w) AS n_words,
        |  CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_ratio,
        |  CASE WHEN len(bg) > 0
        |       THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |       ELSE 0.0 END AS dup_bigram_ratio
        |FROM b""".stripMargin,

    "q54_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phones,
        |  len(regexp_extract_all(
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]+\b')) AS n_numbers,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |      '\b[0-9]+\b', '<NUM>', 'g')) AS scrubbed_fp
        |FROM documents""".stripMargin,

    "q55_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), b AS (
        |  SELECT doc_id, sh,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM sh
        |), train AS (
        |  SELECT DISTINCT sh FROM b WHERE bucket < 80
        |), test AS (
        |  SELECT doc_id, sh FROM b WHERE bucket >= 90
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM test GROUP BY 1
        |), hits AS (
        |  SELECT doc_id, COUNT(*) AS n_contam FROM test
        |  WHERE sh IN (SELECT sh FROM train) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_sh, COALESCE(h.n_contam, 0) AS n_contam,
        |  CAST(COALESCE(h.n_contam, 0) AS DOUBLE) / t.n_sh AS contam_ratio
        |FROM tot t LEFT JOIN hits h USING (doc_id)""".stripMargin,

    "q56_dup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |FROM reach GROUP BY src""".stripMargin,

    "q57_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT word, COUNT(*) AS df FROM tf GROUP BY 1
        |), s AS (
        |  SELECT t.doc_id, t.word, t.tf, d.df, CAST(t.tf AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN dfreq d USING (word)
        |)
        |SELECT doc_id, word, tf, df, score, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rnk FROM s
        |) WHERE rnk <= 3""".stripMargin,

    "q58_freq_spectrum" ->
      """SELECT freq, COUNT(*) AS n_words FROM (
        |  SELECT word, COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word
        |) GROUP BY freq""".stripMargin,

    "q59_chunking" ->
      """SELECT doc_id,
        |  CAST(chunk_off AS INT) AS chunk_off,
        |  length(substring(text, CAST(chunk_off AS INT), 200)) AS chunk_len,
        |  md5(substring(text, CAST(chunk_off AS INT), 200)) AS chunk_fp
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(range(1, greatest(length(text) - 50, 1) + 1, 150)) AS chunk_off
        |  FROM documents
        |)""".stripMargin,

    "q60_lm_score" ->
      """WITH docbg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), c AS (
        |  SELECT bigram, COUNT(*) AS n
        |  FROM (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |        FROM (SELECT string_split(text, ' ') AS w FROM documents)) GROUP BY bigram
        |), lm AS (
        |  SELECT bigram,
        |    CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE) AS p_cond
        |  FROM c
        |)
        |SELECT d.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CAST(floor(p_cond * 1e15) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1e15) AS lm_score
        |FROM docbg d JOIN lm USING (bigram)
        |GROUP BY d.doc_id""".stripMargin,

    // q61: the fixed iters=2 Lloyd loop (Similarity.kmeansCentroids)
    // unrolled into a non-recursive CTE chain. Centroids live as
    // (cid, pos, m) rows; every dot product / norm is the same int64
    // fixed-point sum (floor(x*1e8+0.5)) as Similarity.scala:216 and
    // FixedPointDot, so assignments, means, and the final ranking
    // reproduce bit-for-bit. Two rounds of (argmax-cosine assign with cid
    // tiebreak -> per-(cell,dim) fixed-point mean cast to FLOAT), then
    // the identical probe/score/rank phase as q35.
    "q61_ann_ivf_trained" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM cand c JOIN qe qa ON qa.vec_id = c.query_id
        |  JOIN qe qb ON qb.vec_id = c.neighbor_id AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN vn nq ON nq.vec_id = n.query_id JOIN vn nn ON nn.vec_id = n.neighbor_id
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM scored
        |) WHERE "rank" <= 5""".stripMargin,

    "q62_rolling_revenue" ->
      """SELECT o_orderkey, o_custkey, day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM (SELECT o_orderkey, o_custkey,
        |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |        o_totalprice
        |      FROM orders)""".stripMargin,

    "q63_gap_fill_daily" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), scaffold AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |)
        |SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n, COALESCE(d.sum_value, 0.0) AS sum_value
        |FROM scaffold s LEFT JOIN daily d USING (user_id, day)""".stripMargin,

    "q64_funnel_stages" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
        |), v AS (
        |  SELECT user_id, MIN(sec) AS view_sec FROM e WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT user_id, MIN(sec) AS click_sec FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND sec >= view_sec GROUP BY 1
        |), p AS (
        |  SELECT user_id, MIN(sec) AS purchase_sec FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND sec >= click_sec GROUP BY 1
        |)
        |SELECT user_id, view_sec, click_sec, purchase_sec,
        |  CASE WHEN purchase_sec IS NOT NULL THEN 3
        |       WHEN click_sec IS NOT NULL THEN 2
        |       ELSE 1 END AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "q65_props_extract" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q66_mixture_sample" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1
        |), rates AS (
        |  SELECT source, sqrt(CAST((SELECT MIN(n_src) FROM counts) AS DOUBLE) / n_src) AS keep_rate
        |  FROM counts
        |)
        |SELECT doc_id, d.source, keep_rate
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS DOUBLE)
        |      < keep_rate * 100.0""".stripMargin,

    "q67_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), cohorts AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
        |)
        |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM days JOIN cohorts USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // q68: the Spark side writes the split-partitioned curated corpus and
    // reads the train split back; the oracle recomputes the same aggregate
    // straight from `documents` with the identical md5-bucket split — a
    // green row proves the partitioned write/read round trip is lossless
    // (text fingerprint included) and the split boundary matches.
    "q68_curated_readback" ->
      """WITH b AS (
        |  SELECT lang, n_chars, text,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM b WHERE bucket < 80
        |GROUP BY lang""".stripMargin,

    // q69: the Spark side synthesizes a real PNG per doc and DECODES it
    // with javax.imageio; width/height/pixel-sum come from the decoded
    // image. The oracle recomputes them from the closed-form pixel
    // function (PNG is lossless), so a hash match proves genuine binary
    // codec work round-tripped exactly.
    "q69_mm_png_roundtrip" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 48 AS INT) AS width,
        |    CAST(16 + (doc_id * 7) % 48 AS INT) AS height
        |  FROM documents
        |)
        |SELECT d.doc_id, d.width, d.height,
        |  CAST(SUM( (x * 31 + y * 17 + d.doc_id) % 256
        |          + (x * 13 + y * 29 + d.doc_id * 3) % 256
        |          + (x * 7 + y * 11 + d.doc_id * 5) % 256) AS BIGINT) AS px_sum
        |FROM dims d,
        |LATERAL (SELECT unnest(range(0, d.width)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, d.height)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    // q70: the Spark side joins through bucketed catalog tables (zero
    // join-side exchanges — the write pre-shuffled); the answer must be
    // identical to the plain join, which is exactly what the oracle runs.
    "q70_bucketed_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,

    // q71: the Spark side joins through (event_type, salt) sub-keys; the
    // salt only affects row placement, so the answer must be identical to
    // the plain join — which is what the oracle runs.
    "q71_salted_skew_join" ->
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS type_mean
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.event_type, e.value, s.type_mean,
        |  e.value - s.type_mean AS deviation
        |FROM events e JOIN stats s USING (event_type)""".stripMargin,

    // q72: the Spark side synthesizes a real RIFF/WAVE file per doc and
    // DECODES it with javax.sound.sampled; count/sum/abs-sum come from
    // the decoded PCM frames. The oracle recomputes them from the
    // closed-form sample function (WAV PCM is lossless), so a hash match
    // proves genuine audio codec work round-tripped exactly.
    "q72_mm_wav_roundtrip" ->
      """WITH lens AS (
        |  SELECT doc_id, CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents
        |)
        |SELECT l.doc_id, l.n_samples,
        |  CAST(SUM((l.doc_id * 31 + t * 17) % 65536 - 32768) AS BIGINT) AS sample_sum,
        |  CAST(SUM(ABS((l.doc_id * 31 + t * 17) % 65536 - 32768)) AS BIGINT) AS sample_abs_sum
        |FROM lens l,
        |LATERAL (SELECT unnest(range(0, l.n_samples)) AS t) tt
        |GROUP BY 1, 2""".stripMargin,

    // q73: shard and order are pure md5/id functions, so the oracle
    // reproduces the exact same greedy packing — the window sum BEFORE
    // each doc, floor-divided by the budget, IS the sequence of the doc's
    // first token (the straddle rule).
    "q73_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 32 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
        |              - n_tokens) / 2048.0) AS INT) AS seq_id
        |FROM t""".stripMargin,

    // q74: q55's shingle CTEs at k=5 with a (source, shingle) HAVING —
    // the Spark side keys on md5 digests of the shingles, which changes
    // nothing about the counts (same distinct sets), so raw-shingle SQL
    // is the honest oracle. Docs with <5 words have no 5-shingles and are
    // absent from both sides by construction.
    "q74_boilerplate_ngrams" ->
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5
        |), sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                          FOR i IN range(1, len(w)-3)])) AS sh
        |  FROM d
        |), common AS (
        |  SELECT source, sh FROM sh GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
        |), boiler AS (
        |  SELECT s.doc_id, COUNT(*) AS n_boiler
        |  FROM sh s JOIN common c USING (source, sh) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_sh, COALESCE(b.n_boiler, 0) AS n_boiler,
        |  CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / t.n_sh AS boiler_ratio
        |FROM tot t LEFT JOIN boiler b USING (doc_id)""".stripMargin,

    // q75: SCD2 intervals are a single LEAD window — directly
    // expressible; the tie-break on o_orderkey makes the versioning
    // total, so the hash compare is exact.
    "q75_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin,

    // q76: the result set is layout-independent — a plain filtered scan
    // answers it; the z-order LAYOUT benefit (file pruning) is measured
    // separately by WarehouseSpec's fileBoxes test.
    "q76_zorder_readback" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND o_custkey BETWEEN 100 AND 250""".stripMargin,

    // q77: the as-of probe against the q75 interval table — one version
    // per customer qualifies at any T, enforced by the half-open
    // [valid_from, valid_to) intervals.
    "q77_scd2_asof" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, o_totalprice, valid_from, valid_to
        |FROM h
        |WHERE valid_from <= TIMESTAMP '1996-06-01'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1996-06-01')""".stripMargin,

    // q78: the df band and the 20-id posting cap are part of the
    // contract (they are the scale guards), so the oracle applies the
    // same band and the same sorted slice.
    "q78_inverted_index" ->
      """WITH dw AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        |  FROM documents
        |), banded AS (
        |  SELECT word, COUNT(*) AS df FROM dw GROUP BY 1
        |  HAVING COUNT(*) >= 3
        |    AND COUNT(*) <= floor((SELECT COUNT(*) FROM documents) * 0.95)
        |)
        |SELECT w.word, b.df,
        |  array_to_string(
        |    list_transform(list_sort(list(w.doc_id))[1:20], x -> CAST(x AS VARCHAR)),
        |    ',') AS postings
        |FROM dw w JOIN banded b USING (word)
        |GROUP BY 1, 2""".stripMargin,

    // q79: every value is an elementwise double function of one row's
    // array — round() is spelled floor(x + 0.5) on both engines so the
    // .5 boundary branches identically, and within-row fold order is
    // fixed, so doubles hash-match exactly.
    "q79_emb_quantize" ->
      """WITH x AS (
        |  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xd
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, xd, list_min(xd) AS mn, list_max(xd) AS mx FROM x
        |), s AS (
        |  SELECT vec_id, xd, mn, mx, (mx - mn) / 255.0 AS scale FROM m
        |)
        |SELECT vec_id, mn, mx, scale,
        |  CAST(CASE WHEN scale = 0 THEN 0
        |    ELSE list_sum(list_transform(xd,
        |      e -> CAST(floor((e - mn) / scale + 0.5) AS BIGINT))) END AS BIGINT) AS q_sum,
        |  CASE WHEN scale = 0 THEN 0.0
        |    ELSE list_max(list_transform(xd,
        |      e -> abs(e - (mn + floor((e - mn) / scale + 0.5) * scale)))) END AS max_err
        |FROM s""".stripMargin,

    // q80: distinct (source, shingle) sets at k=3; md5 digesting on the
    // Spark side changes no counts, so raw-shingle SQL is the oracle.
    "q80_source_overlap" ->
      """WITH d AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), ss AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source,
        |      unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |    FROM d
        |  )
        |), sizes AS (
        |  SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY 1
        |), inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT sa.source AS source_a, sb.source AS source_b,
        |  sa.n_sh AS n_a, sb.n_sh AS n_b,
        |  COALESCE(i.n_common, 0) AS n_common,
        |  CAST(COALESCE(i.n_common, 0) AS DOUBLE) /
        |    (sa.n_sh + sb.n_sh - COALESCE(i.n_common, 0)) AS jaccard
        |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        |LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source""".stripMargin,

    // q81: same 1e8 fixed-point quantization as the IVF trainer (q61),
    // so the per-dimension sums are exact integers and the one double
    // division at the end is bit-identical on both engines.
    "q81_lang_centroid" ->
      """WITH qe AS (
        |  SELECT e.vec_id, CAST(i AS INT) AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |)
        |SELECT d.lang, q.pos, COUNT(*) AS n_vecs,
        |  CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS centroid
        |FROM qe q JOIN documents d ON d.doc_id = q.vec_id
        |GROUP BY 1, 2""".stripMargin,

    // q82: dimension = 48-bit md5 prefix mod 64 (the same instr-shift
    // reconstruction as q42's KMV hash), sign = parity of hex digit 13.
    "q82_feature_hash_embed" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), wc AS (
        |  SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY 1, 2
        |), h AS (
        |  SELECT doc_id, word, n,
        |    SUM(((instr('0123456789abcdef', substr(md5(word), CAST(j + 1 AS INT), 1)) - 1)::BIGINT)
        |      << CAST((11 - j) * 4 AS INT)) AS h48
        |  FROM wc, range(0, 12) r(j)
        |  GROUP BY doc_id, word, n
        |)
        |SELECT doc_id, CAST(h48 % 64 AS INT) AS pos,
        |  CAST(SUM(CASE WHEN (instr('0123456789abcdef', substr(md5(word), 13, 1)) - 1) % 2 = 0
        |           THEN n ELSE -n END) AS BIGINT) AS value
        |FROM h GROUP BY 1, 2""".stripMargin,

    // q83: all inputs are exact integer counts; the score is the same
    // fixed shape of three double divisions on both engines, so the
    // (lift DESC, bigram) top-50 cut is deterministic.
    "q83_bigram_lift" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), uni AS (
        |  SELECT unnest(w) AS word FROM t
        |), uc AS (
        |  SELECT word, COUNT(*) AS n_w FROM uni GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT SUM(n_w) FROM uc) AS n_tot,
        |    (SELECT SUM(greatest(len(w) - 1, 0)) FROM t) AS n_bg
        |), bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM t WHERE len(w) >= 2
        |), bc AS (
        |  SELECT bigram, COUNT(*) AS n_ab FROM bg GROUP BY 1 HAVING COUNT(*) >= 5
        |)
        |SELECT b.bigram, b.n_ab, a.n_w AS n_a, c.n_w AS n_b,
        |  (CAST(b.n_ab AS DOUBLE) / t.n_bg) /
        |    ((CAST(a.n_w AS DOUBLE) / t.n_tot) * (CAST(c.n_w AS DOUBLE) / t.n_tot)) AS lift
        |FROM bc b
        |JOIN uc a ON a.word = string_split(b.bigram, ' ')[1]
        |JOIN uc c ON c.word = string_split(b.bigram, ' ')[2]
        |CROSS JOIN tot t
        |ORDER BY lift DESC, b.bigram
        |LIMIT 50""".stripMargin,

    // q84: dots and norms are exact integer tf sums; sqrt and the one
    // division are correctly-rounded IEEE doubles, and the rank order
    // (cos_sim DESC, doc_id) is total — same determinism story as q24/q61.
    "q84_sparse_topk" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1, 2
        |), n2 AS (
        |  SELECT doc_id, SUM(tf * tf) AS n2 FROM tf GROUP BY 1
        |), dots AS (
        |  SELECT q.doc_id AS query_id, d.doc_id, SUM(q.tf * d.tf) AS dot
        |  FROM tf q JOIN tf d USING (word)
        |  WHERE q.doc_id < 10 AND d.doc_id <> q.doc_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT s.query_id, s.doc_id,
        |    CAST(s.dot AS DOUBLE) /
        |      (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
        |  FROM dots s
        |  JOIN n2 a ON a.doc_id = s.query_id
        |  JOIN n2 b ON b.doc_id = s.doc_id
        |)
        |SELECT query_id, doc_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT query_id, doc_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rnk
        |  FROM scored
        |) WHERE rnk <= 5""".stripMargin,

    // q85: the result is format-independent — the oracle computes the
    // same fingerprinted aggregate straight from the parquet source, so
    // a hash match proves the ORC write/read conversion was lossless.
    "q85_orc_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM documents
        |GROUP BY lang""".stripMargin,

    // q86: the per-month aggregate is layout-independent — the oracle
    // recomputes it straight from the source; the compaction mechanics
    // (file count collapse, range clustering) are asserted by
    // WarehouseSpec, not the hash.
    "q86_compaction_readback" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q87: pair counts run on the collapsed vocabulary weighted by word
    // frequency — the oracle mirrors that exactly (same totals as
    // counting over the raw corpus, provably: sum over words of
    // per-word pairs × count).
    "q87_bpe_pairs" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n_word FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1
        |), p AS (
        |  SELECT n_word,
        |    unnest([substr(word, CAST(i AS INT), 2) FOR i IN range(1, len(word))]) AS pair
        |  FROM v WHERE len(word) >= 2
        |)
        |SELECT pair, CAST(SUM(n_word) AS BIGINT) AS n
        |FROM p GROUP BY 1
        |ORDER BY n DESC, pair
        |LIMIT 100""".stripMargin,

    // q88: boundary-based deciles (value at rank ceil(n*d/10), ties share
    // the lower bucket) — deterministic where ntile's positional ties are
    // not; the oracle computes the identical boundaries from the value
    // distribution.
    "q88_length_deciles" ->
      """WITH dist AS (
        |  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1
        |), cum AS (
        |  SELECT n_chars, cnt, SUM(cnt) OVER (ORDER BY n_chars) AS cum FROM dist
        |), tot AS (
        |  SELECT COUNT(*) AS n FROM documents
        |), b AS (
        |  SELECT
        |    MIN(CASE WHEN cum >= ceil(n * 1 / 10.0) THEN n_chars END) AS b1,
        |    MIN(CASE WHEN cum >= ceil(n * 2 / 10.0) THEN n_chars END) AS b2,
        |    MIN(CASE WHEN cum >= ceil(n * 3 / 10.0) THEN n_chars END) AS b3,
        |    MIN(CASE WHEN cum >= ceil(n * 4 / 10.0) THEN n_chars END) AS b4,
        |    MIN(CASE WHEN cum >= ceil(n * 5 / 10.0) THEN n_chars END) AS b5,
        |    MIN(CASE WHEN cum >= ceil(n * 6 / 10.0) THEN n_chars END) AS b6,
        |    MIN(CASE WHEN cum >= ceil(n * 7 / 10.0) THEN n_chars END) AS b7,
        |    MIN(CASE WHEN cum >= ceil(n * 8 / 10.0) THEN n_chars END) AS b8,
        |    MIN(CASE WHEN cum >= ceil(n * 9 / 10.0) THEN n_chars END) AS b9
        |  FROM cum CROSS JOIN tot
        |)
        |SELECT doc_id, n_chars,
        |  CAST(1 + (CASE WHEN b1 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b2 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b3 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b4 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b5 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b6 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b7 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b8 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b9 < n_chars THEN 1 ELSE 0 END) AS INT) AS decile
        |FROM documents CROSS JOIN b""".stripMargin,

    // q89: the aggregate is layout-independent — the oracle computes the
    // same per-priority rollup straight from the source, with the
    // pre-cutover rows (written in the v1 layout that predates the
    // priority column) foldered under the same sentinel mergeSchema
    // null-fills them into.
    "q89_schema_evolution" ->
      """SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
        |            THEN 'PRE_SCHEMA' ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    // q90: pins the three standard null behaviors the Spark side relies
    // on — GROUP BY folds nulls into one group, COUNT(*) vs COUNT(col),
    // and IS NOT DISTINCT FROM (Spark's <=>) matching the null group.
    "q90_null_semantics" ->
      """WITH k AS (
        |  SELECT CASE WHEN event_type = 'view' THEN NULL
        |              ELSE event_type END AS key
        |  FROM events
        |), agg AS (
        |  SELECT key, COUNT(*) AS n_rows, COUNT(key) AS n_nonnull
        |  FROM k GROUP BY key
        |), dim(dkey, dim_id) AS (
        |  VALUES ('click', CAST(1 AS BIGINT)), (NULL, CAST(2 AS BIGINT))
        |)
        |SELECT key, n_rows, n_nonnull, dim_id
        |FROM agg LEFT JOIN dim ON agg.key IS NOT DISTINCT FROM dim.dkey""".stripMargin,

    // q91: the change batch is a pure function of the target (mod-7
    // updates, mod-97 re-keyed inserts, both inside the fixed key window
    // <= 10000 that keeps the batch constant-size at any SF), so the
    // oracle rebuilds it and applies MERGE semantics relationally.
    "q91_merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |), upd AS (
        |  SELECT o_orderkey, o_custkey AS u_custkey,
        |    o_totalprice * CAST(1.05 AS DOUBLE) AS u_price
        |  FROM t WHERE o_orderkey % 7 = 0 AND o_orderkey <= 10000
        |  UNION ALL
        |  SELECT o_orderkey + 6000000, o_custkey, CAST(100.0 AS DOUBLE)
        |  FROM t WHERE o_orderkey % 97 = 0 AND o_orderkey <= 10000
        |)
        |SELECT o_orderkey, o_custkey, o_totalprice, 'keep' AS action
        |FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT t.o_orderkey, t.o_custkey, u.u_price, 'update'
        |FROM t JOIN upd u USING (o_orderkey)
        |UNION ALL
        |SELECT u.o_orderkey, u.u_custkey, u.u_price, 'insert'
        |FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM t)""".stripMargin,

    // q92: snapshot B is a pure function of A (mod-13 deletes, mod-5
    // reprices, mod-101 re-keyed inserts); the diff is the full outer
    // join keeping only changed keys.
    "q92_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |), b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM a WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 7000000, o_totalprice
        |  FROM a WHERE o_orderkey % 101 = 0
        |), j AS (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    a.o_totalprice AS old_price, b.o_totalprice AS new_price
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |)
        |SELECT o_orderkey, old_price, new_price,
        |  CASE WHEN old_price IS NULL THEN 'insert'
        |       WHEN new_price IS NULL THEN 'delete'
        |       WHEN old_price <> new_price THEN 'update' END AS change
        |FROM j
        |WHERE old_price IS NULL OR new_price IS NULL OR old_price <> new_price""".stripMargin,

    // q93: UNPIVOT as the portable UNION ALL form; metric labels are the
    // source column names, matching Spark's unpivot variable column.
    "q93_unpivot_metrics" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |)
        |SELECT metric, COUNT(*) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM m GROUP BY metric""".stripMargin,

    // q94: same shingle CTE family as q55/q74 (md5-digested word-3-grams),
    // then first-occurrence min per shingle and a per-doc prior-fraction.
    "q94_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh0 AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), sh AS (
        |  SELECT doc_id, md5(sh) AS sh FROM sh0
        |), f AS (
        |  SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
        |)
        |SELECT s.doc_id, COUNT(*) AS n_sh,
        |  CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_prior,
        |  CAST(1.0 AS DOUBLE)
        |    - CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*) AS novelty
        |FROM sh s JOIN f USING (sh)
        |GROUP BY s.doc_id""".stripMargin,

    // q95: each FK edge is a left join against the distinct parent keys;
    // relation labels match the Scala literals exactly.
    "q95_fk_integrity" ->
      """SELECT 'lineitem.l_orderkey->orders' AS relation, COUNT(*) AS n_child,
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON c.l_orderkey = p.k
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON c.l_partkey = p.k
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |  ON c.l_suppkey = p.k
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  ON c.o_custkey = p.k
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON c.c_nationkey = p.k""".stripMargin,

    // q96: per-column profile; min/max computed on the native type and
    // stringified only in the output, mirroring the Spark side.
    "q96_column_profile" ->
      """SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows, COUNT(doc_id) AS n_nonnull,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_val, CAST(MAX(doc_id) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(lang), COUNT(DISTINCT lang),
        |  CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source),
        |  CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars),
        |  CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'text', COUNT(*), COUNT(text), COUNT(DISTINCT text),
        |  CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR) FROM documents""".stripMargin,

    // q97: integer-cents moments (hugeint = exact int128, one rounding
    // per double conversion — decimal scale-4 sums double-round their
    // cast in DuckDB once the backing int passes 2^53), then the same
    // fixed chain of double ops as the Spark side.
    "q97_regression_stats" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xc,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS yc
        |  FROM lineitem
        |), m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(xc) AS sx, SUM(yc) AS sy,
        |    SUM(xc * xc) AS sxx, SUM(xc * yc) AS sxy, SUM(yc * yc) AS syy
        |  FROM c GROUP BY 1
        |), d AS (
        |  -- VARCHAR route: DuckDB's direct HUGEINT->DOUBLE cast is not
        |  -- correctly rounded past 2^53; string->double parse is,
        |  -- matching Spark's BigDecimal conversion
        |  SELECT l_returnflag, n,
        |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
        |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
        |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
        |  FROM m
        |)
        |SELECT l_returnflag, n,
        |  cov / vx AS slope,
        |  (syd - cov / vx * sxd) / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE) AS intercept,
        |  cov / (sqrt(vx) * sqrt(vy)) AS corr
        |FROM d""".stripMargin,

    // q98: min/max scalar then one binned aggregate; the bin expression
    // and boundary arithmetic mirror the Spark side op-for-op.
    "q98_price_histogram" ->
      """WITH b AS (
        |  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
        |), w AS (
        |  SELECT mn, mx, (mx - mn) / CAST(20 AS DOUBLE) AS width FROM b
        |), binned AS (
        |  SELECT LEAST(19, CAST(FLOOR((o_totalprice - mn) / width) AS INT)) AS bin,
        |    mn, width
        |  FROM orders CROSS JOIN w
        |)
        |SELECT bin, COUNT(*) AS n,
        |  MIN(mn + CAST(bin AS DOUBLE) * width) AS lo,
        |  MIN(mn + CAST(bin + 1 AS DOUBLE) * width) AS hi
        |FROM binned GROUP BY bin""".stripMargin,

    // q99: distinct names -> last-token block -> in-block levenshtein;
    // DuckDB's levenshtein matches Spark's (unit edit costs).
    "q99_fuzzy_match" ->
      """WITH names AS (
        |  SELECT p_name, COUNT(*) AS n_rows FROM part GROUP BY 1
        |), nb AS (
        |  SELECT p_name, n_rows, string_split(p_name, ' ')[-1] AS blk FROM names
        |)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  a.n_rows AS n_a, b.n_rows AS n_b
        |FROM nb a JOIN nb b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,

    // q100: rank-formula Gini from two integer sums; ranks tie-broken by
    // doc_id (sum is tie-invariant, the break just makes ranks total).
    "q100_length_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
        |  FROM documents
        |), g AS (
        |  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS s0,
        |    SUM(i * n_chars) AS s1
        |  FROM r GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  CAST(2 * s1 AS DOUBLE) / CAST(n_docs * s0 AS DOUBLE)
        |    - CAST(n_docs + 1 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS gini
        |FROM g""".stripMargin,

    // q101: each active (user, day) contributes to 7 report days; report
    // days restricted to observed days; one distinct count per day.
    "q101_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), obs AS (
        |  SELECT DISTINCT day AS report_day FROM ud
        |), contrib AS (
        |  SELECT DISTINCT user_id, day + CAST(k AS INT) AS report_day
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS k)
        |)
        |SELECT report_day, COUNT(*) AS active_users
        |FROM (SELECT DISTINCT user_id, report_day FROM contrib
        |      WHERE report_day IN (SELECT report_day FROM obs))
        |GROUP BY report_day""".stripMargin,

    // q102: lag per (user, type) ordered by exact integer micros with an
    // event_id tiebreak; keep firsts and events >= 30 min after the
    // previous one.
    "q102_event_throttle" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |)
        |SELECT event_id, user_id, event_type, us
        |FROM e
        |WHERE prev_us IS NULL OR us - prev_us >= 1800000000""".stripMargin,

    // q103: conditional min per user (no stream self-join), exclusion of
    // purchase-before-signup, rank-boundary percentiles in exact micros.
    "q103_conversion_latency" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
        |  FROM events
        |  WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY user_id
        |), c AS (
        |  SELECT date_trunc('month', make_timestamp(s_us)) AS cohort,
        |    p_us - s_us AS delta_us, user_id
        |  FROM f
        |  WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= s_us
        |), r AS (
        |  SELECT cohort, delta_us,
        |    ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY delta_us, user_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY cohort) AS n
        |  FROM c
        |)
        |SELECT cohort, MAX(n) AS n_converted,
        |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN delta_us END) AS median_us,
        |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN delta_us END) AS p90_us
        |FROM r GROUP BY cohort""".stripMargin,

    // q105: EXACT set-similarity join — the oracle is the ground-truth
    // quadratic (identical to q21's), because prefix filtering loses no
    // qualifying pair; a hash match here proves exact recall.
    "q105_prefix_simjoin" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8""".stripMargin,

    // q106: the oracle recomputes the rollup from scratch — incremental
    // merge of exact decimal partials must equal the full recompute.
    "q106_incremental_rollup" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    // q107: integer-cents daily sums, exact window moments (hugeint),
    // one double conversion, same op order as the Spark side.
    "q107_revenue_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS x
        |  FROM orders GROUP BY 1
        |), dn AS (
        |  SELECT day, datediff('day', DATE '1970-01-01', day) AS day_num, x FROM daily
        |), st AS (
        |  SELECT day, x,
        |    COUNT(x) OVER w AS n, SUM(x) OVER w AS s1, SUM(x * x) OVER w AS s2
        |  FROM dn
        |  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT day, n AS n_baseline,
        |  CAST(x AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
        |  -- VARCHAR route: DuckDB's direct HUGEINT->DOUBLE cast is not
        |  -- correctly rounded past 2^53 (off by an ulp at sf0.1 moments);
        |  -- string->double parse is, matching Spark's BigDecimal path
        |  CASE WHEN sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
        |                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) = 0
        |       THEN NULL
        |       ELSE (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         / sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
        |                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS z
        |FROM st WHERE n >= 14""".stripMargin,

    // q108: lag over the monthly rollup; growth = (rev - prev) / prev in
    // the same double op order; first month keeps a null ratio.
    "q108_mom_growth" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, revenue,
        |  LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  (revenue - LAG(revenue) OVER (ORDER BY month))
        |    / LAG(revenue) OVER (ORDER BY month) AS growth
        |FROM m""".stripMargin,

    // q109: lead over (micros, event_id) total order — the q102 tie
    // rule; p = one double division of exact bigint counts.
    "q109_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
        |), s AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
        |  FROM e
        |), t AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t""".stripMargin,

    // q110: apriori-pruned within-basket self-join, mirrored order
    // (frequent filter before the pair join, pair filter after).
    "q110_basket_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |f AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= 3),
        |fb AS (SELECT o, p FROM b WHERE p IN (SELECT p FROM f)),
        |pr AS (
        |  SELECT a.p AS part_a, b2.p AS part_b, COUNT(*) AS n
        |  FROM fb a JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
        |  GROUP BY 1, 2
        |),
        |nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM b)
        |SELECT part_a, part_b, n, CAST(n AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support
        |FROM pr, nb WHERE n >= 3""".stripMargin,

    // q111: the oracle runs the global running sum directly (one window)
    // — the Spark side's bucketed two-pass prefix sum must land on
    // identical concurrency values row for row.
    "q111_concurrent_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), g AS (
        |  SELECT user_id, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |), s AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |    MIN(us) AS s_us, MAX(us) AS e_us
        |  FROM g GROUP BY 1, 2
        |), bnd AS (
        |  SELECT user_id, session_seq, s_us AS us, CAST(1 AS BIGINT) AS delta FROM s
        |  UNION ALL
        |  SELECT user_id, session_seq, e_us + 1 AS us, CAST(-1 AS BIGINT) AS delta FROM s
        |)
        |SELECT us, user_id, session_seq, delta,
        |  CAST(SUM(delta) OVER (ORDER BY us, delta, user_id, session_seq
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
        |FROM bnd""".stripMargin,

    // q112: directional containment — the oracle is the full quadratic
    // with a <> instead of <; same recall argument as q105.
    "q112_containment_join" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / ca.n_sh AS containment
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id
        |WHERE CAST(inter AS DOUBLE) / ca.n_sh >= 0.9""".stripMargin,

    // q113: q15's session windows, duration weights in exact integer
    // micros x cents, one double division at the end (same op order).
    "q113_session_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    LAG(epoch_us(ts)) OVER w AS prev_us,
        |    LEAD(epoch_us(ts)) OVER w AS next_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), g AS (
        |  SELECT user_id, us, cents, next_us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq,
        |    LEAD(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_new
        |  FROM f
        |), h AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, cents,
        |    CASE WHEN next_new = 0 THEN next_us - us ELSE 0 END AS gap_us
        |  FROM g
        |)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  CAST(SUM(gap_us) AS BIGINT) AS dur_us,
        |  CASE WHEN SUM(gap_us) = 0 THEN NULL
        |       -- VARCHAR route: correctly-rounded int128->double
        |       ELSE CAST(CAST(SUM(CAST(cents * gap_us AS HUGEINT)) AS VARCHAR) AS DOUBLE)
        |            / CAST(SUM(gap_us) AS DOUBLE) / 100.0 END AS tw_value
        |FROM h GROUP BY 1, 2""".stripMargin,

    // q114: q110's edge CTEs, two unrolled fixed-point iterations; //
    // is floor division but every operand is positive, matching Spark's
    // truncating div exactly.
    "q114_copurchase_rank" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |f AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= 3),
        |fb AS (SELECT o, p FROM b WHERE p IN (SELECT p FROM f)),
        |pr AS (
        |  SELECT a.p AS part_a, b2.p AS part_b
        |  FROM fb a JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |),
        |ed AS (
        |  SELECT part_a AS src, part_b AS dst FROM pr
        |  UNION ALL SELECT part_b AS src, part_a AS dst FROM pr
        |),
        |dg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rk FROM dg),
        |c1 AS (SELECT e.dst, SUM(r.rk // d.deg) AS m
        |       FROM ed e JOIN dg d ON e.src = d.src JOIN r0 r ON e.src = r.node
        |       GROUP BY 1),
        |r1 AS (SELECT d.src AS node, 150000000000 + (COALESCE(c1.m, 0) * 85) // 100 AS rk
        |       FROM dg d LEFT JOIN c1 ON d.src = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r.rk // d.deg) AS m
        |       FROM ed e JOIN dg d ON e.src = d.src JOIN r1 r ON e.src = r.node
        |       GROUP BY 1),
        |r2 AS (SELECT d.src AS node, 150000000000 + (COALESCE(c2.m, 0) * 85) // 100 AS rk
        |       FROM dg d LEFT JOIN c2 ON d.src = c2.dst)
        |SELECT r2.node AS part, dg.deg, CAST(r2.rk AS BIGINT) AS rank_fp
        |FROM r2 JOIN dg ON r2.node = dg.src""".stripMargin,

    // q115: the oracle computes the same per-price reduce + exclusive
    // prefix max in one global window; the Spark side's bucketed
    // two-pass prefix must select the identical frontier rows.
    "q115_pareto_frontier" ->
      """WITH g AS (
        |  SELECT o_totalprice AS pr, MAX(CAST(o_orderdate AS DATE)) AS gmax
        |  FROM orders GROUP BY 1
        |), p AS (
        |  SELECT pr, gmax, MAX(gmax) OVER (ORDER BY pr DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM g
        |), k AS (SELECT pr, gmax FROM p WHERE prev IS NULL OR gmax > prev)
        |SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        |FROM orders JOIN k ON o_totalprice = k.pr AND CAST(o_orderdate AS DATE) = k.gmax""".stripMargin,

    // q116: exact cents moments under the same (date, key) total order;
    // one double conversion after the max.
    "q116_max_drawdown" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), p AS (
        |  SELECT o_custkey, cents,
        |    MAX(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c
        |)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(MAX(peak - cents) AS DOUBLE) / 100.0 AS max_drawdown
        |FROM p GROUP BY 1""".stripMargin,

    // q117: modal pick with the explicit (count desc, type asc) tie
    // rule — deterministic in any engine.
    "q117_modal_event_type" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT user_id, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT user_id, event_type AS modal_type, n FROM r WHERE rn = 1""".stripMargin,

    // q118: same islands construction — exclusive running max of ends,
    // new-episode flags, prefix-summed episode ids — in one window CTE
    // chain; episode ids cast to BIGINT to match Spark's long.
    "q118_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv
        |), g AS (
        |  SELECT user_id, s, e,
        |    SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, event_id
        |        ROWS UNBOUNDED PRECEDING) AS ep
        |  FROM m
        |)
        |SELECT user_id, CAST(ep AS BIGINT) AS episode, MIN(s) AS s_us,
        |  MAX(e) AS e_us, COUNT(*) AS n_events
        |FROM g GROUP BY 1, 2""".stripMargin,

    // q119: day-number minus row-number anchors; identical (len desc,
    // start asc) winner rule.
    "q119_activity_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), r AS (
        |  SELECT user_id, day,
        |    (day - DATE '1970-01-01')
        |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS anchor
        |  FROM d
        |), g AS (
        |  SELECT user_id, anchor, COUNT(*) AS best_len, MIN(day) AS best_start
        |  FROM r GROUP BY 1, 2
        |), k AS (
        |  SELECT user_id, best_len, best_start,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY best_len DESC, best_start) AS rn
        |  FROM g
        |)
        |SELECT user_id, best_len, best_start FROM k WHERE rn = 1""".stripMargin,

    // q120: the same integer floor-divide (// here, div in Spark) and
    // largest-remainder handout; both engines reconcile each order to
    // the cent.
    "q120_allocate_cents" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
        |  FROM lineitem
        |), o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c
        |  FROM orders
        |), j AS (
        |  SELECT l_orderkey, l_linenumber, qty_c, total_c,
        |    SUM(qty_c) OVER (PARTITION BY l_orderkey) AS q_sum
        |  FROM li JOIN o ON l_orderkey = o_orderkey
        |), b AS (
        |  SELECT l_orderkey, l_linenumber, total_c,
        |    (total_c * qty_c) // q_sum AS base,
        |    (total_c * qty_c) % q_sum AS rem
        |  FROM j
        |), r AS (
        |  SELECT l_orderkey, l_linenumber, base,
        |    total_c - SUM(base) OVER (PARTITION BY l_orderkey) AS residual,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS rk
        |  FROM b
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS BIGINT) AS alloc_c,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS DOUBLE) / 100.0 AS alloc
        |FROM r""".stripMargin,

    // q121: the same degree-ordered orientation and wedge closure in
    // CTEs; EXISTS plays the left-semi closure join.
    "q121_triangle_counts" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |freq AS (SELECT p FROM baskets GROUP BY 1 HAVING COUNT(*) >= 2),
        |fb AS (SELECT o, p FROM baskets WHERE p IN (SELECT p FROM freq)),
        |ed AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |),
        |deg AS (
        |  SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM ed UNION ALL SELECT b AS n FROM ed) GROUP BY 1
        |),
        |fwd AS (
        |  SELECT CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN ed.a ELSE ed.b END AS u,
        |         CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN ed.b ELSE ed.a END AS v,
        |         CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN db.d ELSE da.d END AS dv
        |  FROM ed JOIN deg da ON ed.a = da.n JOIN deg db ON ed.b = db.n
        |),
        |wedges AS (
        |  SELECT x.u AS w0, x.v AS w1, y.v AS w2
        |  FROM fwd x JOIN fwd y ON x.u = y.u
        |    AND (x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v))
        |),
        |tri AS (
        |  SELECT w0, w1, w2 FROM wedges WHERE EXISTS (
        |    SELECT 1 FROM fwd WHERE fwd.u = wedges.w1 AND fwd.v = wedges.w2)
        |)
        |SELECT part, COUNT(*) AS n_tri FROM (
        |  SELECT UNNEST([w0, w1, w2]) AS part FROM tri) GROUP BY 1""".stripMargin,

    // q122: one global cumulative-sum window stands in for the bucketed
    // two-pass prefix; identical integer stride arithmetic.
    "q122_systematic_sample" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
        |  FROM orders
        |), c AS (
        |  SELECT o_orderkey, w,
        |    SUM(w) OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(w) OVER () AS grand
        |  FROM r
        |)
        |SELECT o_orderkey, w,
        |  CAST(cum // (grand // 500) - (cum - w) // (grand // 500) AS BIGINT) AS n_picks
        |FROM c WHERE cum // (grand // 500) > (cum - w) // (grand // 500)""".stripMargin,

    // q123: same last-per-month pick, month scaffold via
    // generate_series, and IGNORE NULLS carry-forward.
    "q123_month_end_balance" ->
      """WITH b AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, date_trunc('month', o_orderdate)
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |), lb AS (SELECT o_custkey, month, cents FROM b WHERE rn = 1),
        |mm AS (SELECT MAX(month) AS mmax FROM lb),
        |f AS (SELECT o_custkey, MIN(month) AS m0 FROM lb GROUP BY 1),
        |sc AS (
        |  SELECT f.o_custkey,
        |    CAST(UNNEST(generate_series(CAST(f.m0 AS TIMESTAMP),
        |      CAST(mm.mmax AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month
        |  FROM f, mm
        |), cf AS (
        |  SELECT sc.o_custkey, sc.month,
        |    LAST_VALUE(lb.cents IGNORE NULLS) OVER (PARTITION BY sc.o_custkey
        |      ORDER BY sc.month ROWS UNBOUNDED PRECEDING) AS bal_c
        |  FROM sc LEFT JOIN lb ON sc.o_custkey = lb.o_custkey AND sc.month = lb.month
        |)
        |SELECT month, COUNT(*) AS n_custs, CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS balance
        |FROM cf GROUP BY 1""".stripMargin,

    // q124: within-source and global ranks as single windows; identical
    // integral ceil arithmetic for the rank lookup.
    "q124_quantile_normalize" ->
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
        |t AS (SELECT COUNT(*) AS n_total FROM b),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn_s,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM b
        |), g AS (
        |  SELECT n_chars AS g_chars,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS g_rn
        |  FROM b
        |)
        |SELECT r.doc_id, r.source, r.n_chars, g.g_chars AS norm_chars
        |FROM r, t, g
        |WHERE (r.rn_s * t.n_total + r.n_src - 1) // r.n_src = g.g_rn""".stripMargin,

    // q125: q15's sessionization feeding rank-conditional MAX prefix
    // extraction; concat_ws drops nulls identically in both engines.
    "q125_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), s AS (
        |  SELECT user_id, event_id, event_type, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |), rn AS (
        |  SELECT user_id, session_seq, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY us, event_id) AS rn
        |  FROM s
        |), p AS (
        |  SELECT user_id, session_seq,
        |    MAX(CASE WHEN rn = 1 THEN event_type END) AS t1,
        |    MAX(CASE WHEN rn = 2 THEN event_type END) AS t2,
        |    MAX(CASE WHEN rn = 3 THEN event_type END) AS t3
        |  FROM rn WHERE rn <= 3 GROUP BY 1, 2
        |), c AS (
        |  SELECT concat_ws('>', t1, t2, t3) AS path, COUNT(*) AS n_sessions
        |  FROM p GROUP BY 1
        |), k AS (
        |  SELECT path, n_sessions,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rk
        |  FROM c
        |)
        |SELECT path, n_sessions, rk FROM k WHERE rk <= 20""".stripMargin,

    // q126: identical integral percentile ranks and decimal-routed mean.
    "q126_winsorized_length" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, source, n_chars, rn, n,
        |    (5 * n + 99) // 100 AS lo_rank, (95 * n + 99) // 100 AS hi_rank
        |  FROM r
        |), v AS (
        |  SELECT source, n_chars,
        |    MAX(CASE WHEN rn = lo_rank THEN n_chars END) OVER (PARTITION BY source) AS lo_val,
        |    MAX(CASE WHEN rn = hi_rank THEN n_chars END) OVER (PARTITION BY source) AS hi_val
        |  FROM b
        |)
        |SELECT source, COUNT(*) AS n, MAX(lo_val) AS lo_val, MAX(hi_val) AS hi_val,
        |  CAST(SUM(CAST(GREATEST(LEAST(n_chars, hi_val), lo_val) AS DECIMAL(18,0))) AS DOUBLE)
        |    / COUNT(*) AS wins_mean
        |FROM v GROUP BY 1""".stripMargin,

    // q127: the same two nearest-rank picks over one partitioning.
    "q127_length_mad" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, lang, n_chars, rn, n,
        |    MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) OVER (PARTITION BY lang) AS med
        |  FROM r
        |), d AS (
        |  SELECT doc_id, lang, n, med, ABS(n_chars - med) AS dev FROM m
        |), dr AS (
        |  SELECT lang, n, med, dev,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY dev, doc_id) AS BIGINT) AS drn
        |  FROM d
        |), md AS (
        |  SELECT lang, med,
        |    MAX(CASE WHEN drn = (n + 1) // 2 THEN dev END) OVER (PARTITION BY lang) AS mad
        |  FROM dr
        |)
        |SELECT lang, COUNT(*) AS n, MAX(med) AS median_chars, MAX(mad) AS mad_chars
        |FROM md GROUP BY 1""".stripMargin,

    // q128: digit from the cents integer's string form; expected shares
    // as spelled-out literals (no engine-side log).
    "q128_benford_audit" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders
        |), c AS (
        |  SELECT priority, digit, COUNT(*) AS n FROM d GROUP BY 1, 2
        |), t AS (
        |  SELECT priority, digit, n, SUM(n) OVER (PARTITION BY priority) AS n_prio FROM c
        |)
        |SELECT priority, digit, n,
        |  CASE digit WHEN 1 THEN 0.30102999566398120e0 WHEN 2 THEN 0.17609125905568124e0
        |    WHEN 3 THEN 0.12493873660829993e0 WHEN 4 THEN 0.09691001300805642e0
        |    WHEN 5 THEN 0.07918124604762482e0 WHEN 6 THEN 0.06694678963061322e0
        |    WHEN 7 THEN 0.05799194697768673e0 WHEN 8 THEN 0.05115252244738129e0
        |    WHEN 9 THEN 0.04575749056067514e0 END * CAST(n_prio AS DOUBLE) AS expected
        |FROM t""".stripMargin,

    // q129: same Monday-start week truncation and churn posting rule.
    "q129_growth_accounting" ->
      """WITH aw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
        |), c AS (
        |  SELECT user_id, week,
        |    MIN(week) OVER (PARTITION BY user_id) AS first_week,
        |    LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
        |    LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
        |  FROM aw
        |), mx AS (SELECT MAX(week) AS max_week FROM aw),
        |cls AS (
        |  SELECT week,
        |    CASE WHEN week = first_week THEN 'new'
        |         WHEN prev_week = week - 7 THEN 'retained'
        |         ELSE 'resurrected' END AS kind
        |  FROM c
        |  UNION ALL
        |  SELECT week + 7 AS week, 'churned' AS kind
        |  FROM c, mx
        |  WHERE (next_week IS NULL OR next_week > week + 7) AND week + 7 <= mx.max_week
        |)
        |SELECT week,
        |  COUNT(*) FILTER (kind = 'new') AS n_new,
        |  COUNT(*) FILTER (kind = 'retained') AS n_retained,
        |  COUNT(*) FILTER (kind = 'resurrected') AS n_resurrected,
        |  COUNT(*) FILTER (kind = 'churned') AS n_churned
        |FROM cls GROUP BY 1""".stripMargin,

    // q130: identical lead gap in exact micros; last events excluded.
    "q130_state_dwell" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n_intervals,
        |  CAST(SUM(next_us - us) AS BIGINT) AS total_us,
        |  CAST(SUM(next_us - us) AS DOUBLE) / COUNT(*) AS mean_us
        |FROM e WHERE next_us IS NOT NULL GROUP BY 1""".stripMargin,

    // q131: the same three boundary ladders (cum over distinct values,
    // ceil(n·k/5.0) picks) and inverted recency digit.
    "q131_rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_date, COUNT(*) AS freq,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS mon_c
        |  FROM orders GROUP BY 1
        |), a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
        |b AS (SELECT base.*, CAST(anchor - last_date AS BIGINT) AS rec_days FROM base, a),
        |n AS (SELECT COUNT(*) AS n FROM b),
        |rd AS (SELECT rec_days AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |rc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM rd),
        |rb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS rb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS rb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS rb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS rb4 FROM rc, n),
        |fd AS (SELECT freq AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |fc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM fd),
        |fb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS fb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS fb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS fb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS fb4 FROM fc, n),
        |md AS (SELECT mon_c AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |mc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM md),
        |mb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS mb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS mb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS mb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS mb4 FROM mc, n),
        |s AS (
        |  SELECT o_custkey,
        |    6 - (1 + (rb1 < rec_days)::INT + (rb2 < rec_days)::INT
        |           + (rb3 < rec_days)::INT + (rb4 < rec_days)::INT) AS r_score,
        |    1 + (fb1 < freq)::INT + (fb2 < freq)::INT
        |      + (fb3 < freq)::INT + (fb4 < freq)::INT AS f_score,
        |    1 + (mb1 < mon_c)::INT + (mb2 < mon_c)::INT
        |      + (mb3 < mon_c)::INT + (mb4 < mon_c)::INT AS m_score
        |  FROM b, rb, fb, mb
        |)
        |SELECT o_custkey, r_score, f_score, m_score,
        |  r_score*100 + f_score*10 + m_score AS segment FROM s""".stripMargin,

    // q132: identical integral nearest-rank picks per priority.
    "q132_ship_lag" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), r AS (
        |  SELECT priority, lag_days,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY lag_days, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
        |  FROM l
        |)
        |SELECT priority, COUNT(*) AS n_items,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS p50_days,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS p90_days
        |FROM r GROUP BY 1""".stripMargin,

    // q133: one global cumulative window stands in for bucketedPrefix;
    // integer tenths thresholds.
    "q133_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey AS part,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT SUM(rev_c) AS grand FROM rev),
        |c AS (
        |  SELECT part, rev_c,
        |    SUM(rev_c) OVER (ORDER BY rev_c DESC, part ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM rev
        |)
        |SELECT CASE WHEN cum * 10 <= grand * 7 THEN 'A'
        |            WHEN cum * 10 <= grand * 9 THEN 'B' ELSE 'C' END AS abc_class,
        |  COUNT(*) AS n_parts, CAST(SUM(rev_c) AS BIGINT) AS rev_c,
        |  CAST(SUM(rev_c) AS DOUBLE) / CAST(MAX(grand) AS DOUBLE) AS share
        |FROM c, t GROUP BY 1""".stripMargin,

    // q134: adjacent-order lag screen with the same integer 5% rule.
    "q134_duplicate_charges" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), l AS (
        |  SELECT o_custkey, cents, o_orderkey, d,
        |    LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_key,
        |    LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_d,
        |    LAG(cents) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_c
        |  FROM o
        |)
        |SELECT o_custkey, prev_key, o_orderkey, prev_c, cents,
        |  CAST(d - prev_d AS BIGINT) AS gap_days
        |FROM l WHERE prev_key IS NOT NULL AND d - prev_d <= 30
        |  AND ABS(cents - prev_c) * 20 <= prev_c""".stripMargin,

    // q135: the same 6-table star with exact decimal discount math.
    "q135_local_supplier_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    // q136: numerator and denominator in one exact-decimal pass, one
    // double division per year.
    "q136_market_share" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
        |  CAST(SUM(CASE WHEN n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    // q137: quarter rank + part lag with the delta computed before the
    // top-100 cut.
    "q137_part_velocity" ->
      """WITH q AS (
        |  SELECT l_partkey AS part, CAST(date_trunc('quarter', l_shipdate) AS DATE) AS quarter,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT part, quarter, qty_c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY quarter ORDER BY qty_c DESC, part) AS BIGINT) AS rank
        |  FROM q
        |), l AS (
        |  SELECT part, quarter, qty_c, rank,
        |    LAG(rank) OVER (PARTITION BY part ORDER BY quarter) AS prev_rank
        |  FROM r
        |)
        |SELECT part, quarter, qty_c, rank, prev_rank, prev_rank - rank AS rank_delta
        |FROM l WHERE rank <= 100""".stripMargin,

    // q138: identical integer-cents header/detail comparison; orderless
    // orders reconcile against zero via the left join + coalesce.
    "q138_order_reconciliation" ->
      """WITH ls AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS line_c
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c,
        |    COALESCE(line_c, 0) AS line_c
        |  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey
        |)
        |SELECT priority, COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (ABS(total_c - line_c) > 0) AS n_mismatched,
        |  CAST(MAX(ABS(total_c - line_c)) AS BIGINT) AS max_drift_c,
        |  CAST(SUM(ABS(total_c - line_c)) AS BIGINT) AS total_drift_c
        |FROM j GROUP BY 1""".stripMargin,

    // q139: isodow matches Spark's weekday()+1 — the engines' default
    // dayofweek functions number weeks differently.
    "q139_weekday_profile" ->
      """WITH c AS (
        |  SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS isodow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, isodow, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
        |FROM c""".stripMargin,

    // q140: pure rank arithmetic and float PICKS — no float math for
    // engines to round differently.
    "q140_quantile_codebook" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim, embedding[i] AS x
        |  FROM embeddings em, LATERAL (SELECT unnest(range(1, len(em.embedding) + 1)) AS i) t
        |), r AS (
        |  SELECT vec_id, dim, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x, vec_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY dim) AS BIGINT) AS n
        |  FROM e
        |), c AS (
        |  SELECT dim, x, rn, ((rn - 1) * 16) // n AS code FROM r
        |), b AS (
        |  SELECT dim, code, x, rn,
        |    CAST(COUNT(*) OVER (PARTITION BY dim, code) AS BIGINT) AS size,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY dim, code ORDER BY rn) AS BIGINT) AS lrn
        |  FROM c
        |), m AS (
        |  SELECT dim, code, x, size,
        |    MAX(CASE WHEN lrn = (size + 1) // 2 THEN x END) OVER (PARTITION BY dim, code) AS med
        |  FROM b
        |)
        |SELECT dim, CAST(code AS BIGINT) AS code, COUNT(*) AS n_members,
        |  CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi,
        |  CAST(MAX(med) AS DOUBLE) AS centroid
        |FROM m GROUP BY 1, 2""".stripMargin,

    // q141: identical integral nearest-rank quartiles in cents.
    "q141_five_number" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), r AS (
        |  SELECT segment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM j
        |)
        |SELECT segment, COUNT(*) AS n, MIN(cents) AS min_c,
        |  MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN cents END) AS p25_c,
        |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END) AS p50_c,
        |  MAX(CASE WHEN rn = (75 * n + 99) // 100 THEN cents END) AS p75_c,
        |  MAX(cents) AS max_c
        |FROM r GROUP BY 1""".stripMargin,

    // q142: the same doubled-cents integer fences.
    "q142_iqr_outliers" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), r AS (
        |  SELECT segment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM j
        |), q AS (
        |  SELECT segment AS qseg,
        |    MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN cents END) AS p25_c,
        |    MAX(CASE WHEN rn = (75 * n + 99) // 100 THEN cents END) AS p75_c
        |  FROM r GROUP BY 1
        |)
        |SELECT segment, COUNT(*) AS n,
        |  COUNT(*) FILTER (cents * 2 < p25_c * 2 - (p75_c - p25_c) * 3) AS n_low,
        |  COUNT(*) FILTER (cents * 2 > p75_c * 2 + (p75_c - p25_c) * 3) AS n_high
        |FROM j JOIN q ON segment = qseg GROUP BY 1""".stripMargin,

    // q143: exact marginals; expected/residual as the same per-cell
    // three-op double chain (no order-dependent chi-square total).
    "q143_contingency" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |    COUNT(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT segment, priority, o,
        |    CAST(SUM(o) OVER (PARTITION BY segment) AS BIGINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS c,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells
        |)
        |SELECT segment, priority, o, r, c,
        |  CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
        |  (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt(CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)) AS residual
        |FROM m""".stripMargin,

    // q144: the distinct train-position relation plays the bit array;
    // the all-k-positions rule is a join + count(=k); hex->int via the
    // '0x' cast idiom.
    "q144_bloom_screen" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh0 AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), b AS (
        |  SELECT doc_id, sh,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
        |  FROM sh0
        |), train AS (SELECT DISTINCT sh FROM b WHERE bucket < 80),
        |test AS (SELECT doc_id, sh FROM b WHERE bucket >= 90),
        |tp AS (
        |  SELECT DISTINCT CAST('0x' || SUBSTR(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 12) AS BIGINT) % 262144 AS p
        |  FROM train, (SELECT unnest(range(0, 3)) AS j) js
        |), pass AS (
        |  SELECT doc_id, COUNT(*) AS n_pass FROM (
        |    SELECT t.doc_id, t.sh FROM (
        |      SELECT doc_id, sh,
        |        CAST('0x' || SUBSTR(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 12) AS BIGINT) % 262144 AS p
        |      FROM test, (SELECT unnest(range(0, 3)) AS j) js
        |    ) t JOIN tp USING (p)
        |    GROUP BY 1, 2 HAVING COUNT(*) = 3
        |  ) GROUP BY 1
        |), ex AS (
        |  SELECT doc_id, COUNT(*) AS n_exact FROM test WHERE sh IN (SELECT sh FROM train) GROUP BY 1
        |)
        |SELECT t.doc_id, COUNT(*) AS n_sh,
        |  COALESCE(MAX(pass.n_pass), 0) AS n_pass,
        |  COALESCE(MAX(ex.n_exact), 0) AS n_exact,
        |  COALESCE(MAX(pass.n_pass), 0) - COALESCE(MAX(ex.n_exact), 0) AS n_false_pos
        |FROM test t LEFT JOIN pass ON t.doc_id = pass.doc_id LEFT JOIN ex ON t.doc_id = ex.doc_id
        |GROUP BY 1""".stripMargin,

    // q145: leading-token family extraction, decimal-cents sums.
    "q145_part_family" ->
      """SELECT string_split(p_name, ' ')[1] AS family, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    // q146: percent_rank's (rank-1)/(n-1) closed form is shared.
    "q146_supplier_standing" ->
      """SELECT s_suppkey, n_name, s_acctbal,
        |  PERCENT_RANK() OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal, s_suppkey) AS pr
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin,

    // q147: both distinct counts via the bounded contribution explode.
    "q147_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |obs AS (SELECT DISTINCT day AS report_day FROM ud),
        |dau AS (SELECT day AS report_day, COUNT(*) AS dau FROM ud GROUP BY 1),
        |mau AS (
        |  SELECT report_day, COUNT(*) AS mau FROM (
        |    SELECT DISTINCT user_id, day + CAST(k AS INT) AS report_day
        |    FROM ud, (SELECT unnest(range(0, 30)) AS k) ks
        |    WHERE day + CAST(k AS INT) IN (SELECT report_day FROM obs)
        |  ) GROUP BY 1
        |)
        |SELECT d.report_day, d.dau, m.mau,
        |  CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness
        |FROM dau d JOIN mau m ON d.report_day = m.report_day""".stripMargin,

    // q148: one global cumulative window stands in for bucketedPrefix;
    // same (d, delta, key) total order, ends-at-day+1 netting.
    "q148_order_backlog" ->
      """WITH spans AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS open_d,
        |    close_d
        |  FROM orders JOIN (
        |    SELECT l_orderkey,
        |      CAST(MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS close_d
        |    FROM lineitem GROUP BY 1) ls ON o_orderkey = l_orderkey
        |), bounds AS (
        |  SELECT o_orderkey, open_d AS d, CAST(1 AS BIGINT) AS delta FROM spans
        |  UNION ALL
        |  SELECT o_orderkey, close_d + 1 AS d, CAST(-1 AS BIGINT) AS delta FROM spans
        |)
        |SELECT d, o_orderkey, delta,
        |  CAST(SUM(delta) OVER (ORDER BY d, delta, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
        |FROM bounds""".stripMargin,

    // q149: identical integral ceil cut ranks; share is one division.
    "q149_revenue_concentration" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS n_cust, SUM(rev_c) AS grand FROM rev),
        |rk AS (
        |  SELECT o_custkey, rev_c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rank
        |  FROM rev
        |)
        |SELECT t.tier_pct, COUNT(*) AS n_customers,
        |  CAST(SUM(rev_c) AS BIGINT) AS tier_rev_c,
        |  CAST(SUM(rev_c) AS DOUBLE) / CAST(MAX(grand) AS DOUBLE) AS share
        |FROM rk, tot, (SELECT CAST(unnest([1, 5, 20]) AS BIGINT) AS tier_pct) t
        |WHERE rank <= (t.tier_pct * n_cust + 99) // 100
        |GROUP BY 1""".stripMargin,

    // q150: q49/q20/q50/q40's rules composed; the split hash is salted
    // ('split|') so the sample and split decisions stay independent.
    "q150_curation_funnel" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE NOT (n_chars < 50 OR n_chars > 5000
        |    OR len(string_split(text, ' ')) < 10
        |    OR CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) > 12.0
        |    OR CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) > 0.10)
        |), k AS (
        |  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
        |), dd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
        |samp AS (
        |  SELECT doc_id FROM dd
        |  WHERE CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100
        |    < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |), spl AS (
        |  SELECT doc_id,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    CAST('0x' || SUBSTR(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS b
        |    FROM samp)
        |)
        |SELECT '1_all' AS stage, COUNT(*) AS n_docs FROM documents
        |UNION ALL SELECT '2_quality', COUNT(*) FROM q
        |UNION ALL SELECT '3_dedup', COUNT(*) FROM dd
        |UNION ALL SELECT '4_sampled', COUNT(*) FROM samp
        |UNION ALL SELECT '5_' || split, COUNT(*) FROM spl GROUP BY split""".stripMargin,

    // q151: same horizon scalar and bucket boundaries.
    "q151_open_order_aging" ->
      """WITH ls AS (
        |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
        |  FROM lineitem GROUP BY 1
        |), h AS (SELECT MAX(close_d) AS h FROM ls)
        |SELECT CASE WHEN age_days <= 365 THEN '0-1y'
        |            WHEN age_days <= 1095 THEN '1-3y' ELSE '3y+' END AS age_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS value_c
        |FROM (
        |  SELECT o_totalprice,
        |    CAST(h - CAST(o_orderdate AS DATE) AS BIGINT) AS age_days
        |  FROM orders JOIN ls ON o_orderkey = l_orderkey, h
        |  WHERE close_d >= h
        |) GROUP BY 1""".stripMargin,

    // q152: exact integer numerators/denominators, one division each.
    "q152_return_rates" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |    COUNT(*) AS n_items,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qty_c,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS ret_qty_c,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS ret_rev_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT month, n_items,
        |  CAST(ret_qty_c AS DOUBLE) / CAST(qty_c AS DOUBLE) AS qty_return_rate,
        |  CAST(ret_rev_c AS DOUBLE) / CAST(rev_c AS DOUBLE) AS rev_return_rate
        |FROM m""".stripMargin,

    // q153: same sourcing buckets over distinct-supplier counts.
    "q153_supply_risk" ->
      """WITH p AS (
        |  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CASE WHEN n_suppliers <= 20 THEN 'concentrated'
        |            WHEN n_suppliers <= 30 THEN 'moderate' ELSE 'diversified' END AS sourcing,
        |  COUNT(*) AS n_parts, CAST(SUM(rev_c) AS BIGINT) AS rev_c
        |FROM p GROUP BY 1""".stripMargin,

    // q154: identical integer gap moments and four-op double CV chain.
    "q154_purchase_regularity" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    o_orderkey
        |  FROM orders
        |), gp AS (
        |  SELECT o_custkey,
        |    d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
        |  FROM g
        |), m AS (
        |  SELECT o_custkey, COUNT(*) AS n,
        |    CAST(SUM(gap) AS BIGINT) AS s1, CAST(SUM(gap * gap) AS BIGINT) AS s2
        |  FROM gp WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2
        |)
        |SELECT o_custkey, n AS n_gaps,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_days,
        |  CASE WHEN s1 = 0 THEN NULL ELSE
        |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) END AS cv
        |FROM m""".stripMargin,

    // q155: the same distinct-cents boundary ladder and band rule.
    "q155_price_band_mix" ->
      """WITH c AS (
        |  SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders
        |), n AS (SELECT COUNT(*) AS n FROM c),
        |dist AS (SELECT c.c, COUNT(*) AS cnt FROM c GROUP BY 1),
        |cum AS (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum FROM dist),
        |b AS (
        |  SELECT MIN(CASE WHEN cum >= CEIL(n * 1 / 5.0) THEN c END) AS b1,
        |    MIN(CASE WHEN cum >= CEIL(n * 2 / 5.0) THEN c END) AS b2,
        |    MIN(CASE WHEN cum >= CEIL(n * 3 / 5.0) THEN c END) AS b3,
        |    MIN(CASE WHEN cum >= CEIL(n * 4 / 5.0) THEN c END) AS b4
        |  FROM cum, n
        |), banded AS (
        |  SELECT month,
        |    1 + (b1 < c.c)::INT + (b2 < c.c)::INT + (b3 < c.c)::INT + (b4 < c.c)::INT AS band
        |  FROM c, b
        |), mc AS (
        |  SELECT month, CAST(band AS BIGINT) AS band, COUNT(*) AS n FROM banded GROUP BY 1, 2
        |)
        |SELECT month, band, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY month) AS DOUBLE) AS share
        |FROM mc""".stripMargin,

    // q156: same integer month offsets and monotone cum pick.
    "q156_ltv_curve" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), c AS (
        |  SELECT o_custkey, ym,
        |    SUM(cents) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS cum_c,
        |    ym - MIN(ym) OVER (PARTITION BY o_custkey) AS offset_m
        |  FROM o
        |), per AS (
        |  SELECT o_custkey, offset_m, MAX(cum_c) AS cum_at_offset
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT offset_m, COUNT(*) AS n_customers,
        |  CAST(SUM(cum_at_offset) AS DOUBLE) / COUNT(*) / 100.0 AS avg_cum_spend
        |FROM per GROUP BY 1""".stripMargin,

    // q157: identical span/bucket rules.
    "q157_shipment_stagger" ->
      """WITH s AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    CAST(MAX(CAST(l_shipdate AS DATE)) - MIN(CAST(l_shipdate AS DATE)) AS BIGINT) AS span_days
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT o_orderpriority AS priority,
        |  CASE WHEN n_lines = 1 THEN 'single_line'
        |       WHEN span_days = 0 THEN 'same_day' ELSE 'staggered' END AS profile,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(span_days) AS DOUBLE) / COUNT(*) AS mean_span_days
        |FROM orders JOIN s ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin,

    // q158: distinct (order, family) pairs; directional conditionals.
    "q158_cross_sell" ->
      """WITH f AS (
        |  SELECT DISTINCT l_orderkey AS o, string_split(p_name, ' ')[1] AS family
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |), n AS (SELECT family, COUNT(*) AS n_a FROM f GROUP BY 1),
        |ab AS (
        |  SELECT a.family AS family_a, b.family AS family_b, COUNT(*) AS n_ab
        |  FROM f a JOIN f b ON a.o = b.o AND a.family <> b.family
        |  GROUP BY 1, 2
        |)
        |SELECT family_a, family_b, n_ab, n_a,
        |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_b_given_a
        |FROM ab JOIN n ON family_a = n.family""".stripMargin,

    // q159: q40's buckets, exact shares, decimal-routed means.
    "q159_split_balance" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |), s AS (
        |  SELECT CASE WHEN bucket < 80 THEN 'train'
        |              WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |    n_chars FROM b
        |), t AS (SELECT COUNT(*) AS n_total FROM b)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_total) AS DOUBLE) AS share,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS mean_chars
        |FROM s, t GROUP BY 1""".stripMargin,

    // q160: exact integer HHI ratio, one division.
    "q160_lang_concentration" ->
      """WITH sl AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT source, COUNT(*) AS n_langs, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(n * n) AS BIGINT) AS ss
        |  FROM sl GROUP BY 1
        |)
        |SELECT source, n_langs, n_docs,
        |  CAST(ss AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE) AS hhi
        |FROM s""".stripMargin,

    // q161: one global (rank, cum) window stands in for the
    // struct-valued bucketed prefix; identical decile cut ranks.
    "q161_lorenz_curve" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS n_cust, SUM(rev_c) AS grand FROM rev),
        |rk AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev_c, o_custkey) AS BIGINT) AS rank,
        |    CAST(SUM(rev_c) OVER (ORDER BY rev_c, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        |  FROM rev
        |)
        |SELECT CAST(d.d AS BIGINT) AS decile, rank AS n_cust_cum, cum_c,
        |  CAST(cum_c AS DOUBLE) / CAST(grand AS DOUBLE) AS cum_share
        |FROM rk, tot, (SELECT unnest(range(1, 11)) AS d) d
        |WHERE rank = (d.d * n_cust + 9) // 10""".stripMargin,

    // q162: distinct same-day purchases, per-(customer, family) lags,
    // integral median rank per family.
    "q162_repurchase_cycle" ->
      """WITH p AS (
        |  SELECT DISTINCT o_custkey, string_split(p_name, ' ')[1] AS family,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |), g AS (
        |  SELECT o_custkey, family, d,
        |    d - LAG(d) OVER (PARTITION BY o_custkey, family ORDER BY d) AS gap
        |  FROM p
        |), r AS (
        |  SELECT family, gap,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY family ORDER BY gap, o_custkey, d) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY family) AS BIGINT) AS n
        |  FROM g WHERE gap IS NOT NULL
        |)
        |SELECT family, COUNT(*) AS n_gaps,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS median_gap_days
        |FROM r GROUP BY 1""".stripMargin,

    // q163: same literal target table and integer lag compare.
    "q163_sla_compliance" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    CASE o_orderpriority WHEN '1-URGENT' THEN 60 WHEN '2-HIGH' THEN 90
        |      WHEN '3-MEDIUM' THEN 120 ELSE 180 END AS target_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT priority, CAST(MAX(target_days) AS BIGINT) AS target_days,
        |  COUNT(*) AS n_items,
        |  COUNT(*) FILTER (lag_days <= target_days) AS n_on_time,
        |  CAST(COUNT(*) FILTER (lag_days <= target_days) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS compliance
        |FROM l GROUP BY 1""".stripMargin,

    // q164: same horizon scalar and 365-day dormancy rule.
    "q164_dormant_parts" ->
      """WITH p AS (
        |  SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship,
        |    COUNT(*) AS n_lifetime,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1
        |), h AS (SELECT MAX(last_ship) AS h FROM p)
        |SELECT l_partkey, last_ship, n_lifetime, rev_c
        |FROM p, h WHERE h - last_ship > 365""".stripMargin,

    // q165: same per-order line counts and exact mean values.
    "q165_basket_sizes" ->
      """WITH b AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
        |)
        |SELECT n_lines, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 100.0 AS mean_value
        |FROM b JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // q166: q163's target table per supplier; exact-integer ratios.
    "q166_supplier_scorecard" ->
      """WITH l AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c,
        |    CASE o_orderpriority WHEN '1-URGENT' THEN 60 WHEN '2-HIGH' THEN 90
        |      WHEN '3-MEDIUM' THEN 120 ELSE 180 END AS target_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT l_suppkey, COUNT(*) AS n_items,
        |  CAST(SUM(rev_c) AS BIGINT) AS rev_c,
        |  CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS mean_lag_days,
        |  CAST(COUNT(*) FILTER (lag_days <= target_days) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS on_time_share
        |FROM l GROUP BY 1""".stripMargin,

    // q167: basis-point bands; exact counts.
    "q167_discount_effect" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) = 0 THEN 'none'
        |         WHEN CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) <= 500 THEN '1-5%'
        |         ELSE '6%+' END AS band
        |  FROM lineitem
        |)
        |SELECT band, COUNT(*) AS n_items,
        |  COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,
        |  CAST(COUNT(*) FILTER (l_returnflag = 'R') AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS return_rate
        |FROM b GROUP BY 1""".stripMargin,

    // q168: the same two nearest-rank picks and integer fence.
    "q168_volume_anomalies" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
        |), r AS (
        |  SELECT day, n,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n, day) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS cnt
        |  FROM d
        |), m AS (
        |  SELECT day, n, cnt,
        |    MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n END) OVER () AS med
        |  FROM r
        |), dv AS (
        |  SELECT day, n, cnt, med, ABS(n - med) AS dev,
        |    CAST(ROW_NUMBER() OVER (ORDER BY ABS(n - med), day) AS BIGINT) AS drn
        |  FROM m
        |), md AS (
        |  SELECT day, n, med, dev,
        |    MAX(CASE WHEN drn = (cnt + 1) // 2 THEN dev END) OVER () AS mad
        |  FROM dv
        |)
        |SELECT day, CAST(n AS BIGINT) AS n, CAST(med AS BIGINT) AS med,
        |  CAST(mad AS BIGINT) AS mad, CAST(dev AS BIGINT) AS dev
        |FROM md WHERE dev > 3 * mad""".stripMargin,

    // q169: Q7-shaped cross-border flows with exact decimal discounts.
    "q169_trade_flows" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE ns.n_name <> nc.n_name
        |GROUP BY 1, 2""".stripMargin,

    // q170: exact cents share scaled by 12.
    "q170_seasonality_index" ->
      """WITH m AS (
        |  SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month_of_year,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1
        |)
        |SELECT month_of_year, n_orders, rev_c,
        |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE) * 12.0
        |    AS seasonality_index
        |FROM m""".stripMargin,

    // q171: same single-space tokenization as Text.words.
    "q171_type_token_ratio" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
        |), tok AS (SELECT lang, COUNT(*) AS n_tokens FROM w GROUP BY 1),
        |typ AS (
        |  SELECT lang, COUNT(*) AS n_types FROM (SELECT DISTINCT lang, w FROM w) GROUP BY 1
        |)
        |SELECT tok.lang, n_tokens, n_types,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
        |FROM tok JOIN typ ON tok.lang = typ.lang""".stripMargin,

    // q172: distinct family breadth per customer; same bucket rules.
    "q172_category_breadth" ->
      """WITH cf AS (
        |  SELECT DISTINCT o_custkey, string_split(p_name, ' ')[1] AS family
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |), nb AS (
        |  SELECT o_custkey, COUNT(*) AS n_families FROM cf GROUP BY 1
        |), cr AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |)
        |SELECT CASE WHEN n_families <= 2 THEN 'specialist'
        |            WHEN n_families <= 5 THEN 'regular' ELSE 'explorer' END AS breadth,
        |  COUNT(*) AS n_customers, CAST(SUM(rev_c) AS BIGINT) AS rev_c
        |FROM nb JOIN cr USING (o_custkey) GROUP BY 1""".stripMargin,

    // q173: same integral p50 pick per quarter.
    "q173_median_order_trend" ->
      """WITH q AS (
        |  SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
        |    o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), r AS (
        |  SELECT quarter, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY quarter ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY quarter) AS BIGINT) AS n
        |  FROM q
        |)
        |SELECT quarter, COUNT(*) AS n_orders,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS DOUBLE) / 100.0
        |    AS median_value
        |FROM r GROUP BY 1""".stripMargin,

    // q174: first-occurrence checkpoint histogram + ten-row prefixes.
    "q174_vocab_growth" ->
      """WITH w AS (
        |  SELECT CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 // 10 AS ck,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents
        |), tok AS (SELECT ck, COUNT(*) AS n_tokens FROM w GROUP BY 1),
        |fst AS (
        |  SELECT ck, COUNT(*) AS n_new_types FROM (
        |    SELECT w, MIN(ck) AS ck FROM w GROUP BY 1) GROUP BY 1
        |)
        |SELECT tok.ck AS checkpoint, n_tokens,
        |  COALESCE(n_new_types, 0) AS n_new_types,
        |  CAST(SUM(n_tokens) OVER (ORDER BY tok.ck) AS BIGINT) AS cum_tokens,
        |  CAST(SUM(COALESCE(n_new_types, 0)) OVER (ORDER BY tok.ck) AS BIGINT) AS cum_vocab
        |FROM tok LEFT JOIN fst ON tok.ck = fst.ck""".stripMargin,

    // q175: same buckets and exact lag moments.
    "q175_lag_by_basket" ->
      """WITH p AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    MAX(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT CASE WHEN n_lines <= 2 THEN '1-2'
        |              WHEN n_lines <= 4 THEN '3-4' ELSE '5+' END AS size_bucket,
        |    CAST(last_ship - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days
        |  FROM orders JOIN p ON o_orderkey = l_orderkey
        |)
        |SELECT size_bucket, COUNT(*) AS n_orders,
        |  CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS mean_lag_days,
        |  MAX(lag_days) AS max_lag_days
        |FROM j GROUP BY 1""".stripMargin,

    // q176: isodow weekend rule (engines' default dayofweek disagree).
    "q176_weekend_mix" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS isodow
        |  FROM orders
        |)
        |SELECT month, COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (isodow >= 6) AS n_weekend,
        |  CAST(COUNT(*) FILTER (isodow >= 6) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS weekend_share
        |FROM m GROUP BY 1""".stripMargin,

    // q177: negative-balance exposure per role and nation, exact cents.
    "q177_negative_balances" ->
      """SELECT role, n_name, n_accounts, exposure_c FROM (
        |  SELECT 'customer' AS role, c_nationkey AS nk, COUNT(*) AS n_accounts,
        |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS exposure_c
        |  FROM customer WHERE c_acctbal < 0 GROUP BY 2
        |  UNION ALL
        |  SELECT 'supplier', s_nationkey, COUNT(*),
        |    CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY 2
        |) JOIN nation ON nk = n_nationkey""".stripMargin,

    // q178: weekly distinct-type cohorts with exact volume ratios.
    "q178_engagement_diversity" ->
      """WITH u AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT CAST(n_types AS BIGINT) AS n_types, COUNT(*) AS n_user_weeks,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_events
        |FROM u GROUP BY 1""".stripMargin,

    // q179: same week-wide capped buckets.
    "q179_gap_histogram" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    o_orderkey
        |  FROM orders
        |), gp AS (
        |  SELECT d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
        |  FROM g
        |)
        |SELECT LEAST(gap // 7, 26) AS week_bucket, COUNT(*) AS n_gaps
        |FROM gp WHERE gap IS NOT NULL GROUP BY 1""".stripMargin,

    // q180: q97's moment discipline; VARCHAR route for the
    // correctly-rounded int128->double conversions.
    "q180_size_revenue_corr" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS y
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT p_brand, CAST(p_size AS HUGEINT) AS x, y
        |  FROM rev JOIN part ON l_partkey = p_partkey
        |), m AS (
        |  SELECT p_brand, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy, SUM(y * y) AS syy
        |  FROM j GROUP BY 1
        |), d AS (
        |  SELECT p_brand, n,
        |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
        |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
        |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy
        |  FROM m
        |)
        |SELECT p_brand, n,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE cov / (sqrt(vx) * sqrt(vy)) END AS corr
        |FROM d""".stripMargin,

    // q181: two-level share with the same leader tie rule.
    "q181_brand_share" ->
      """WITH fb AS (
        |  SELECT string_split(p_name, ' ')[1] AS family, p_brand,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT family, p_brand, rev_c,
        |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER (PARTITION BY family) AS DOUBLE) AS share,
        |  ROW_NUMBER() OVER (PARTITION BY family ORDER BY rev_c DESC, p_brand) = 1 AS is_leader
        |FROM fb""".stripMargin,

    // q182: integer 2x compare for the 50% dominance band.
    "q182_line_dominance" ->
      """WITH o AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS tot_c,
        |    CAST(MAX(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS max_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CASE WHEN n_lines = 1 THEN 'single'
        |            WHEN max_c * 2 >= tot_c THEN 'dominant' ELSE 'spread' END AS band,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(max_c) AS DOUBLE) / CAST(SUM(tot_c) AS DOUBLE) AS pooled_max_share
        |FROM o GROUP BY 1""".stripMargin,

    // q183: q160's exact HHI over the supplier-nation flow counts.
    "q183_export_diversity" ->
      """WITH f AS (
        |  SELECT l_suppkey, c_nationkey, COUNT(*) AS n
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |)
        |SELECT l_suppkey, COUNT(*) AS n_nations, CAST(SUM(n) AS BIGINT) AS n_items,
        |  CAST(SUM(n * n) AS DOUBLE) / CAST(SUM(n) * SUM(n) AS DOUBLE) AS hhi
        |FROM f GROUP BY 1""".stripMargin,

    // q184: first-quarter reduce + tiny cumulative.
    "q184_acquisition_curve" ->
      """WITH f AS (
        |  SELECT o_custkey, MIN(CAST(date_trunc('quarter', o_orderdate) AS DATE)) AS quarter
        |  FROM orders GROUP BY 1
        |), q AS (SELECT quarter, COUNT(*) AS n_new FROM f GROUP BY 1)
        |SELECT quarter, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY quarter ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_customers
        |FROM q""".stripMargin,

    // q185: exact cents over exact distinct actives.
    "q185_arpu_trend" ->
      """SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
        |  COUNT(DISTINCT o_custkey) AS n_active,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |    / COUNT(DISTINCT o_custkey) / 100.0 AS arpu
        |FROM orders GROUP BY 1""".stripMargin,

    // q186: q130's lead gap keyed to the destination type.
    "q186_pre_transition_dwell" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events
        |)
        |SELECT next_type, COUNT(*) AS n_intervals,
        |  CAST(SUM(next_us - us) AS BIGINT) AS total_us,
        |  CAST(SUM(next_us - us) AS DOUBLE) / COUNT(*) AS mean_us
        |FROM e WHERE next_us IS NOT NULL GROUP BY 1""".stripMargin,

    // q187: identical regex classes and exact ratios.
    "q187_char_class_profile" ->
      """WITH d AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS n_chars_t,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_punct,
        |    CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_t) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_digit) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS digit_ratio,
        |  CAST(SUM(n_punct) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS punct_ratio,
        |  CAST(SUM(n_space) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS space_ratio
        |FROM d GROUP BY 1""".stripMargin,

    // q188: the same distinct-cents boundary ladder over unit prices.
    "q188_qty_by_price_band" ->
      """WITH r AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
        |  FROM lineitem
        |), n AS (SELECT COUNT(*) AS n FROM r),
        |dist AS (SELECT c, COUNT(*) AS cnt FROM r GROUP BY 1),
        |cum AS (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum FROM dist),
        |b AS (
        |  SELECT MIN(CASE WHEN cum >= CEIL(n * 1 / 5.0) THEN c END) AS b1,
        |    MIN(CASE WHEN cum >= CEIL(n * 2 / 5.0) THEN c END) AS b2,
        |    MIN(CASE WHEN cum >= CEIL(n * 3 / 5.0) THEN c END) AS b3,
        |    MIN(CASE WHEN cum >= CEIL(n * 4 / 5.0) THEN c END) AS b4
        |  FROM cum, n
        |)
        |SELECT CAST(1 + (b1 < c)::INT + (b2 < c)::INT + (b3 < c)::INT + (b4 < c)::INT AS BIGINT) AS band,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(q) AS DOUBLE) / COUNT(*) / 100.0 AS mean_qty
        |FROM r, b GROUP BY 1""".stripMargin,

    // q189: same first/last picks and integer ratio tests.
    "q189_expansion_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders
        |), r AS (
        |  SELECT o_custkey, c,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS n,
        |    FIRST_VALUE(c) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS first_c
        |  FROM o
        |)
        |SELECT CASE WHEN n = 1 THEN 'single_order'
        |            WHEN c >= first_c * 2 THEN 'expanding'
        |            WHEN c * 2 <= first_c THEN 'contracting'
        |            ELSE 'stable' END AS cohort,
        |  COUNT(*) AS n_customers
        |FROM r WHERE rn = n GROUP BY 1""".stripMargin,

    // q104: layout-independent fingerprint aggregate (same as q85's),
    // recomputed straight from the parquet source.
    "q104_json_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM documents
        |GROUP BY lang""".stripMargin,

    // q190: the same deterministic top-200 vocabulary (count desc, word
    // asc) and the same per-source OOV rollup.
    "q190_oov_rate" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), v AS (
        |  SELECT word FROM (
        |    SELECT word, COUNT(*) AS n FROM w GROUP BY 1
        |    ORDER BY n DESC, word LIMIT 200)
        |)
        |SELECT w.source, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS oov_rate
        |FROM w LEFT JOIN v ON w.word = v.word
        |GROUP BY 1""".stripMargin,

    // q191: the q24 fixed-point cosine kernel against the vec_id%50
    // eval slice, max per training vector, same 0.35 flag line.
    "q191_semantic_decontam" ->
      """WITH t AS (
        |  SELECT vec_id AS test_id, embedding AS te FROM embeddings WHERE vec_id % 50 = 0
        |), pairs AS (
        |  SELECT e.vec_id, t.test_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nt
        |  FROM embeddings e, t, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) l
        |  WHERE e.vec_id % 50 != 0
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT vec_id,
        |    MAX(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nt AS DOUBLE)))) AS max_cos
        |  FROM pairs GROUP BY 1
        |)
        |SELECT vec_id, max_cos FROM c WHERE max_cos >= 0.35""".stripMargin,

    // q192: the oracle recomputes the view from scratch — the merge of
    // base + delta aggregates must be exactly lossless.
    "q192_incremental_mv" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders GROUP BY 1""".stripMargin,

    // q193: the md5 lottery makes the per-source winners a pure function
    // of doc_id, so a window formulation reproduces the bounded
    // aggregate's picks exactly (fixed-length lowercase hex sorts
    // identically to its numeric value).
    "q193_domain_cap" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50""".stripMargin,

    // q194: sqrt(sqrt(x)) and the final division are the only float ops
    // (both IEEE-correctly-rounded in every engine); the allocation
    // itself is pure int64 arithmetic — see Prep.mixtureWeights.
    "q194_mixture_weights" ->
      """WITH t AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM t
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT source, n_docs, n_tokens, w_int,
        |  base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS DOUBLE) / n_tokens AS epochs
        |FROM r""".stripMargin,

    // q195: q56's recursive-CTE connected components, finished with the
    // canonical election (n_chars desc, doc_id asc per cluster).
    "q195_canonical_docs" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), labeled AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src
        |), m AS (
        |  SELECT l.cluster, l.doc_id, dd.n_chars,
        |    COUNT(*) OVER (PARTITION BY l.cluster) AS n_members,
        |    row_number() OVER (PARTITION BY l.cluster ORDER BY dd.n_chars DESC, l.doc_id) AS rk
        |  FROM labeled l JOIN documents dd USING (doc_id)
        |)
        |SELECT cluster, doc_id AS rep_doc, n_chars AS rep_chars, n_members
        |FROM m WHERE rk = 1""".stripMargin,

    // q196: q22's verified-pair CTEs, then positional grams, diagonal
    // alignment, and a gaps-and-islands longest-run per pair.
    "q196_dup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), pos AS (
        |  SELECT doc_id, u.p AS p, u.sh AS sh
        |  FROM (
        |    SELECT doc_id, unnest([{'p': i, 'sh': w[i] || ' ' || w[i+1] || ' ' || w[i+2]} FOR i IN range(1, len(w)-1)]) AS u
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 3)
        |), matches AS (
        |  SELECT p.doc_a, p.doc_b, a.p AS pa, a.p - b.p AS d
        |  FROM pairs p
        |  JOIN pos a ON a.doc_id = p.doc_a
        |  JOIN pos b ON b.doc_id = p.doc_b AND b.sh = a.sh
        |), runs AS (
        |  SELECT doc_a, doc_b, d,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, d ORDER BY pa) AS island,
        |    pa
        |  FROM matches
        |), agg AS (
        |  SELECT doc_a, doc_b, d, island, COUNT(*) AS run_len, MIN(pa) AS a_start
        |  FROM runs GROUP BY 1, 2, 3, 4
        |), best AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY run_len DESC, d, a_start) AS rk
        |  FROM agg
        |)
        |SELECT doc_a, doc_b, run_len, run_len + 2 AS span_words, a_start, a_start - d AS b_start
        |FROM best WHERE rk = 1""".stripMargin,

    // q197: the oracle is the single-pass exact count — the two-pass
    // sketch+recount must output the identical heavy-hitter set.
    "q197_heavy_hitters" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (SELECT gram, COUNT(*) AS cnt FROM bg GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n_total FROM bg)
        |SELECT gram, cnt, CAST(cnt AS DOUBLE) / n_total AS freq
        |FROM c, t WHERE cnt * 1000 >= n_total""".stripMargin,

    // q198: exact tier by text md5; near tier reuses the q22 band CTEs
    // restricted to delta×corpus by the q55 bucket formula.
    "q198_delta_dedup" ->
      """WITH bkt AS (
        |  SELECT doc_id, text,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS corpus_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey
        |  JOIN bkt ba ON ba.doc_id = a.doc_id AND ba.bucket >= 95
        |  JOIN bkt bc ON bc.doc_id = b.doc_id AND bc.bucket < 95
        |), near AS (
        |  SELECT DISTINCT c.delta_id AS doc_id
        |  FROM cand c JOIN d da ON c.delta_id = da.doc_id JOIN d db ON c.corpus_id = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |), ex AS (
        |  SELECT DISTINCT dd.doc_id FROM bkt dd
        |  WHERE dd.bucket >= 95 AND md5(dd.text) IN (SELECT md5(text) FROM bkt WHERE bucket < 95)
        |)
        |SELECT dl.doc_id,
        |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
        |       WHEN near.doc_id IS NOT NULL THEN 'near'
        |       ELSE 'unique' END AS verdict
        |FROM (SELECT doc_id FROM bkt WHERE bucket >= 95) dl
        |LEFT JOIN ex ON dl.doc_id = ex.doc_id
        |LEFT JOIN near ON dl.doc_id = near.doc_id""".stripMargin,

    // q199: the oracle's single global window is the semantics; the
    // Spark plan computes the identical prefix with the two-pass
    // range-bucketed sum.
    "q199_vocab_coverage" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (SELECT gram, COUNT(*) AS cnt FROM bg GROUP BY 1),
        |r AS (
        |  SELECT gram, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, gram) AS rnk,
        |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, gram ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c
        |), t AS (SELECT COUNT(*) AS n FROM bg)
        |SELECT rnk AS vocab_size, gram AS boundary_gram, CAST(cum AS DOUBLE) / n AS coverage
        |FROM r, t WHERE rnk IN (50, 100, 200, 400, 800)""".stripMargin,

    // q200: truth = q21's quadratic at the LSH threshold, computed on the
    // deterministic 1000-doc md5 audit tier (Dedup.auditTier — at sf0.01's
    // 500 docs the tier IS the corpus, so this SQL exercises the full
    // semantics); candidates and verified reuse the q22 CTEs tier-scoped;
    // three scalar counts and two ratios.
    "q200_lsh_recall_audit" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM tier)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM truth) AS n_truth,
        |  (SELECT COUNT(*) FROM cand) AS n_candidates,
        |  (SELECT COUNT(*) FROM verified) AS n_verified,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0) AS recall,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 0) AS precision
        |FROM (SELECT 1) one""".stripMargin,

    // q201: the streaming corpus-probe's batch twin — q198's bucket/band
    // CTEs, emitting verified (stream-doc, corpus-doc) pairs with exact
    // Jaccard instead of per-doc verdicts.
    "q201_corpus_neardup_probe" ->
      """WITH bkt AS (
        |  SELECT doc_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey
        |  JOIN bkt ba ON ba.doc_id = a.doc_id AND ba.bucket >= 95
        |  JOIN bkt bc ON bc.doc_id = b.doc_id AND bc.bucket < 95
        |)
        |SELECT p.doc_id, p.corpus_id,
        |  CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) AS jaccard
        |FROM pairs p JOIN d da ON p.doc_id = da.doc_id JOIN d db ON p.corpus_id = db.doc_id
        |WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8""".stripMargin,

    // q202: the streaming quality monitor's batch twin — 15-minute
    // tumbling buckets (time_bucket aligns with Spark's window() for
    // sub-day intervals) with per-clause violation counts.
    "q202_contract_monitor" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_value,
        |  CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_type
        |FROM events GROUP BY 1""".stripMargin,

    // q203: DSIR importance weights. Bucket = the same 16-bit md5 prefix
    // as Spark's conv(substring(md5(bigram),1,4),16,10), spelled in
    // instr-nibble arithmetic (the q40 idiom); the likelihood ratio is
    // pure integer arithmetic (((t+1)·10⁶) // (r+1), target ⊆ raw so
    // r ≥ t keeps everything ≤ 10⁶), so the only doubles are the two
    // final correctly-rounded expressions — bit-identical cross-engine.
    "q203_dsir_weights" ->
      """WITH bg AS (
        |  SELECT doc_id, lang, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
        |), db AS (
        |  SELECT doc_id, lang,
        |    ( (instr('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(bigram), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(bigram), 4, 1)) - 1) ) % 256 AS bucket,
        |    COUNT(*) AS c
        |  FROM bg GROUP BY 1, 2, 3
        |), raw AS (
        |  SELECT bucket, SUM(c) AS r FROM db GROUP BY 1
        |), tgt AS (
        |  SELECT bucket, SUM(c) AS t FROM db WHERE lang = 'en' GROUP BY 1
        |), dom AS (
        |  SELECT unnest(range(0, 256)) AS bucket
        |), lr AS (
        |  SELECT dom.bucket,
        |    ((COALESCE(t, 0) + 1) * 1000000) // (COALESCE(r, 0) + 1) AS lr
        |  FROM dom LEFT JOIN raw ON raw.bucket = dom.bucket
        |  LEFT JOIN tgt ON tgt.bucket = dom.bucket
        |), tot AS (
        |  SELECT SUM(c) AS big_r,
        |    SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS big_t FROM db
        |), ds AS (
        |  SELECT doc_id, SUM(c * lr) AS s, CAST(SUM(c) AS BIGINT) AS n_bigrams
        |  FROM db JOIN lr USING (bucket) GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(s AS DOUBLE) / (n_bigrams * 1e6) AS mean_lr,
        |  (CAST(s AS DOUBLE) / (n_bigrams * 1e6)) *
        |    (CAST(big_r + 256 AS DOUBLE) / CAST(big_t + 256 AS DOUBLE)) AS dsir_weight
        |FROM ds, tot""".stripMargin,

    // q204: SemDedup. The training/assignment chain (qe … assign) is the
    // q61 unrolled fixed-point Lloyd loop verbatim — same k=8, iters=2 —
    // then within-cluster pairwise fixed-point cosine and the
    // lowest-id-wins drop at tau=0.4.
    "q204_semdedup" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), mp AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |), pd AS (
        |  SELECT mp.va, mp.vb, SUM(qa.qx * qb.qx) AS dot
        |  FROM mp JOIN qe qa ON qa.vec_id = mp.va
        |  JOIN qe qb ON qb.vec_id = mp.vb AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), drp AS (
        |  SELECT DISTINCT pd.vb AS vec_id
        |  FROM pd JOIN vn na ON na.vec_id = pd.va JOIN vn nb ON nb.vec_id = pd.vb
        |  WHERE CAST(pd.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4
        |)
        |SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS keep
        |FROM assign a LEFT JOIN drp d ON d.vec_id = a.vec_id""".stripMargin,

    // q205: per-source total-variation drift. Bucket = the same 16-bit
    // md5 prefix as Spark's conv(substring(md5(word),1,4),16,10) % 256;
    // cross products run in HUGEINT (Spark side: DECIMAL(38,0)) so the
    // arithmetic is exact at any scale; one correctly-rounded final
    // division.
    "q205_source_divergence" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), sb AS (
        |  SELECT source,
        |    ( (instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(word), 4, 1)) - 1) ) % 256 AS bucket,
        |    COUNT(*) AS c_sb
        |  FROM w GROUP BY 1, 2
        |), bt AS (
        |  SELECT bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb GROUP BY 1
        |), st AS (
        |  SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_src FROM sb GROUP BY 1
        |), nt AS (
        |  SELECT CAST(SUM(c_sb) AS BIGINT) AS n_total FROM sb
        |), grid AS (
        |  SELECT st.source, st.n_src, bt.bucket, bt.c_b, nt.n_total,
        |    COALESCE(sb.c_sb, 0) AS c_sb
        |  FROM st CROSS JOIN bt CROSS JOIN nt
        |  LEFT JOIN sb ON sb.source = st.source AND sb.bucket = bt.bucket
        |)
        |SELECT source, n_src AS n_words,
        |  CAST(SUM(abs(CAST(c_sb AS HUGEINT) * n_total - CAST(c_b AS HUGEINT) * n_src)) AS DOUBLE)
        |    / (2.0 * CAST(n_src AS DOUBLE) * CAST(n_total AS DOUBLE)) AS tv
        |FROM grid GROUP BY 1, 2, n_total""".stripMargin,

    // q206: cluster keywords by lift. Training/assignment chain
    // (qe … assign) = the q61/q204 unrolled fixed-point Lloyd loop
    // verbatim (k=8, iters=2); lift = (c_cw/n_c)/(c_w/N) over exact
    // counts — three correctly-rounded double ops, identical in both
    // engines — ranked per cluster with the word tiebreak, support
    // floor c_cw >= 3, top 5.
    "q206_cluster_keywords" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), wds AS (
        |  SELECT doc_id AS vec_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), cw AS (
        |  SELECT a.cid, w.word, COUNT(*) AS c_cw
        |  FROM wds w JOIN assign a ON a.vec_id = w.vec_id GROUP BY 1, 2
        |), ct AS (
        |  SELECT cid, CAST(SUM(c_cw) AS BIGINT) AS n_c FROM cw GROUP BY 1
        |), wt AS (
        |  SELECT word, CAST(SUM(c_cw) AS BIGINT) AS c_w FROM cw GROUP BY 1
        |), nt AS (
        |  SELECT CAST(SUM(c_cw) AS BIGINT) AS n_total FROM cw
        |), scored AS (
        |  SELECT cw.cid, cw.word, cw.c_cw,
        |    (CAST(cw.c_cw AS DOUBLE) / CAST(ct.n_c AS DOUBLE)) /
        |      (CAST(wt.c_w AS DOUBLE) / CAST(nt.n_total AS DOUBLE)) AS lift
        |  FROM cw JOIN ct USING (cid) JOIN wt USING (word) CROSS JOIN nt
        |  WHERE cw.c_cw >= 3
        |)
        |SELECT cid, rk, word, c_cw, lift FROM (
        |  SELECT *, row_number() OVER (PARTITION BY cid ORDER BY lift DESC, word) AS rk FROM scored
        |) WHERE rk <= 5""".stripMargin,

    // q207: windowed distribution-drift monitor (batch twin of
    // StreamingOps.driftMonitor). Fixed type vocabulary + other bucket;
    // TV numerator in HUGEINT (Spark side: DECIMAL(38,0)), one
    // correctly-rounded final division.
    "q207_drift_monitor" ->
      """WITH base AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS b_view,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS b_click,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_purchase,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS b_signup,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS b_error,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS b_other,
        |    COUNT(*) AS n_base
        |  FROM events
        |), win AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_view,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_click,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_purchase,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c_signup,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c_error,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS c_other,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT w_start, n_events,
        |  CAST(
        |      abs(CAST(c_view AS HUGEINT) * n_base - CAST(b_view AS HUGEINT) * n_events)
        |    + abs(CAST(c_click AS HUGEINT) * n_base - CAST(b_click AS HUGEINT) * n_events)
        |    + abs(CAST(c_purchase AS HUGEINT) * n_base - CAST(b_purchase AS HUGEINT) * n_events)
        |    + abs(CAST(c_signup AS HUGEINT) * n_base - CAST(b_signup AS HUGEINT) * n_events)
        |    + abs(CAST(c_error AS HUGEINT) * n_base - CAST(b_error AS HUGEINT) * n_events)
        |    + abs(CAST(c_other AS HUGEINT) * n_base - CAST(b_other AS HUGEINT) * n_events)
        |  AS DOUBLE) / (2.0 * CAST(n_events AS DOUBLE) * CAST(n_base AS DOUBLE)) AS tv
        |FROM win CROSS JOIN base""".stripMargin,

    // q208: cluster purity audit. Training/assignment chain (qe … assign)
    // = the q61/q204/q206 unrolled fixed-point Lloyd loop verbatim (k=8,
    // iters=2); majority = rank-1 by (cnt DESC, label ASC), purity = one
    // correctly-rounded division.
    "q208_cluster_purity" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), cl AS (
        |  SELECT a.cid, e.label, COUNT(*) AS cnt
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id GROUP BY 1, 2
        |), tot AS (
        |  SELECT cid, CAST(SUM(cnt) AS BIGINT) AS n_members FROM cl GROUP BY 1
        |), mj AS (
        |  SELECT cid, label AS majority_label, cnt AS n_majority FROM (
        |    SELECT cid, label, cnt, row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS rn FROM cl
        |  ) WHERE rn = 1
        |)
        |SELECT t.cid, t.n_members, m.majority_label, m.n_majority,
        |  CAST(m.n_majority AS DOUBLE) / CAST(t.n_members AS DOUBLE) AS purity
        |FROM tot t JOIN mj m ON m.cid = t.cid""".stripMargin,

    // q209: daily distinct-actives via the q42 KMV idiom — k=64 smallest
    // distinct 48-bit md5 hashes per day; exact below k, the
    // (k-1)<<48 / h_k inversion (17732923532771328 = 63<<48) above.
    "q209_daily_uniques" ->
      """WITH hx AS (
        |  SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS w_start,
        |    md5(CAST(user_id AS VARCHAR)) AS m
        |  FROM events
        |), hh AS (
        |  SELECT DISTINCT w_start,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM hx, range(0, 12) r(j) GROUP BY w_start, m
        |), kt AS (
        |  SELECT w_start, h, row_number() OVER (PARTITION BY w_start ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY w_start) AS nd
        |  FROM hh
        |), ndv AS (
        |  SELECT w_start,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_users
        |  FROM kt GROUP BY w_start
        |), cnt AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT c.w_start, c.n_events, n.ndv_users
        |FROM cnt c JOIN ndv n ON n.w_start = c.w_start""".stripMargin,

    // q210: BPE merge learning, the fixed nMerges=3 loop unrolled (the
    // q61 discipline). Each step: word-frequency-weighted adjacent-pair
    // counts -> argmax with (t1, t2) tiebreak -> greedy DISJOINT merge
    // via island windows (odd ranks of each consecutive-match run merge,
    // the following position is consumed, positions renumber densely) —
    // the same window algebra as Corpus.bpeLearn, so the merge table is
    // bit-identical.
    "q210_bpe_learn" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n_word FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1
        |), t0 AS (
        |  SELECT word, n_word, i AS pos, substr(word, CAST(i AS INT), 1) AS tok
        |  FROM v, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) r
        |), c1 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b1 AS (
        |  SELECT t1, t2, cnt FROM c1 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g1 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0) f
        |  CROSS JOIN b1 b
        |), h1 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g1
        |), s1 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h1
        |), w1 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s1
        |), r1 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w1 WHERE NOT prev_sel
        |), c2 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b2 AS (
        |  SELECT t1, t2, cnt FROM c2 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g2 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1) f
        |  CROSS JOIN b2 b
        |), h2 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g2
        |), s2 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h2
        |), w2 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s2
        |), r2 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w2 WHERE NOT prev_sel
        |), c3 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b3 AS (
        |  SELECT t1, t2, cnt FROM c3 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |)
        |SELECT CAST(1 AS BIGINT) AS merge_step, t1, t2, cnt AS pair_count, t1 || t2 AS new_token FROM b1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), t1, t2, cnt, t1 || t2 FROM b2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), t1, t2, cnt, t1 || t2 FROM b3""".stripMargin,

    "q211_bpe_tokenize" ->
      """WITH sw AS (
        |  SELECT source, word, COUNT(*) AS n_sw FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1, 2
        |), v AS (
        |  SELECT word, CAST(SUM(n_sw) AS BIGINT) AS n_word FROM sw GROUP BY 1
        |), t0 AS (
        |  SELECT word, n_word, i AS pos, substr(word, CAST(i AS INT), 1) AS tok
        |  FROM v, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) r
        |), c1 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b1 AS (
        |  SELECT t1, t2, cnt FROM c1 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g1 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0) f
        |  CROSS JOIN b1 b
        |), h1 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g1
        |), s1 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h1
        |), w1 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s1
        |), r1 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w1 WHERE NOT prev_sel
        |), c2 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b2 AS (
        |  SELECT t1, t2, cnt FROM c2 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g2 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1) f
        |  CROSS JOIN b2 b
        |), h2 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g2
        |), s2 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h2
        |), w2 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s2
        |), r2 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w2 WHERE NOT prev_sel
        |), c3 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b3 AS (
        |  SELECT t1, t2, cnt FROM c3 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g3 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2) f
        |  CROSS JOIN b3 b
        |), h3 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g3
        |), s3 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h3
        |), w3 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s3
        |), r3 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w3 WHERE NOT prev_sel
        |), nt AS (
        |  SELECT word, COUNT(*) AS n_toks FROM r3 GROUP BY 1
        |)
        |SELECT source,
        |  CAST(SUM(n_sw) AS BIGINT) AS n_words,
        |  CAST(SUM(n_sw * n_toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_sw * len(word)) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_sw * n_toks) AS DOUBLE) / CAST(SUM(n_sw) AS DOUBLE) AS tokens_per_word,
        |  CAST(SUM(n_sw * len(word)) AS DOUBLE) / CAST(SUM(n_sw * n_toks) AS DOUBLE) AS chars_per_token
        |FROM sw JOIN nt USING (word) GROUP BY source""".stripMargin,

    "q212_pq_encode" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id < 16
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, code, qdist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |)
        |SELECT CAST(sub AS INT) AS subspace, code, COUNT(*) AS n_assigned,
        |  CAST(SUM(qdist) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e8 AS avg_sqerr
        |FROM enc GROUP BY 1, 2""".stripMargin,

    "q213_pq_adc_topk" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id < 16
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |), lut AS (
        |  SELECT vec_id AS query_id, sub, code, qdist AS qd FROM dists WHERE vec_id < 10
        |), adc AS (
        |  SELECT l.query_id, e.vec_id AS neighbor_id,
        |    CAST(SUM(l.qd) AS DOUBLE) / 1e8 AS adc_sqdist
        |  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
        |  WHERE e.vec_id != l.query_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, neighbor_id, adc_sqdist, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_sqdist, neighbor_id) AS "rank"
        |  FROM adc
        |) WHERE "rank" <= 10""".stripMargin,

    "q214_coreset_coverage" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 6) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), reps AS (
        |  SELECT MIN(vec_id) AS rep_id FROM sig GROUP BY bucket
        |), rcos AS (
        |  SELECT e.vec_id, r.rep_id,
        |    CAST(SUM(q.qa * q.qb) AS DOUBLE) /
        |      (sqrt(CAST(SUM(q.qa * q.qa) AS DOUBLE)) * sqrt(CAST(SUM(q.qb * q.qb) AS DOUBLE))) AS cosine
        |  FROM embeddings e
        |  JOIN reps r ON TRUE
        |  JOIN embeddings er ON er.vec_id = r.rep_id,
        |  LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qa,
        |    CAST(floor(CAST(er.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qb) q
        |  GROUP BY 1, 2
        |), nearest AS (
        |  SELECT vec_id, rep_id, cosine FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, rep_id) AS rn
        |    FROM rcos
        |  ) WHERE rn = 1
        |)
        |SELECT rep_id, COUNT(*) AS n_covered, MIN(cosine) AS min_cos,
        |  CAST(SUM(CASE WHEN cosine >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_close
        |FROM nearest GROUP BY rep_id""".stripMargin,

    "q215_jl_distortion" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 16) tp(p), range(1, 65) ti(i)
        |), e40 AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    SUM(hp.s * CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)) AS y
        |  FROM e40 e, hp GROUP BY 1, 2
        |), pcos AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(SUM(pa.y * pb.y) AS DOUBLE) /
        |      (sqrt(CAST(SUM(pa.y * pa.y) AS DOUBLE)) * sqrt(CAST(SUM(pb.y * pb.y) AS DOUBLE))) AS cos_proj
        |  FROM e40 a
        |  JOIN e40 b ON a.vec_id < b.vec_id
        |  JOIN proj pa ON pa.vec_id = a.vec_id
        |  JOIN proj pb ON pb.vec_id = b.vec_id AND pb.p = pa.p
        |  GROUP BY 1, 2
        |), ocos AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(SUM(q.qa * q.qb) AS DOUBLE) /
        |      (sqrt(CAST(SUM(q.qa * q.qa) AS DOUBLE)) * sqrt(CAST(SUM(q.qb * q.qb) AS DOUBLE))) AS cos_orig
        |  FROM e40 a
        |  JOIN e40 b ON a.vec_id < b.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(a.embedding) + 1)) AS i) t,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(a.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qa,
        |    CAST(floor(CAST(b.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qb) q
        |  GROUP BY 1, 2
        |)
        |SELECT o.vec_a, o.vec_b, o.cos_orig, p.cos_proj,
        |  p.cos_proj - o.cos_orig AS distortion
        |FROM ocos o JOIN pcos p ON o.vec_a = p.vec_a AND o.vec_b = p.vec_b""".stripMargin,

    "q216_filter_sweep" ->
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS n_words,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents
        |), b AS (
        |  SELECT LEAST(CAST(floor(score * 20) AS BIGINT), 19) AS bin, n_words FROM d
        |), g AS (
        |  SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_tokens
        |  FROM b GROUP BY 1
        |)
        |SELECT bin, CAST(bin AS DOUBLE) / 20 AS score_lo, n_docs, n_tokens,
        |  CAST(SUM(n_docs) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        |  CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM g""".stripMargin,

    "q217_dedup_sweep" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pj AS (
        |  SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |), t AS (
        |  SELECT unnest([0.3, 0.5, 0.7, 0.8, 0.9]) AS threshold
        |), sw AS (
        |  SELECT t.threshold, pj.doc_a, pj.doc_b FROM t JOIN pj ON pj.jaccard >= t.threshold
        |), ps AS (
        |  SELECT threshold, COUNT(*) AS n_pairs, COUNT(DISTINCT doc_b) AS n_dropped
        |  FROM sw GROUP BY 1
        |), ms AS (
        |  SELECT threshold, COUNT(DISTINCT doc_id) AS n_docs_affected FROM (
        |    SELECT threshold, doc_a AS doc_id FROM sw
        |    UNION ALL
        |    SELECT threshold, doc_b AS doc_id FROM sw
        |  ) GROUP BY 1
        |)
        |SELECT t.threshold,
        |  CAST(COALESCE(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(ps.n_dropped, 0) AS BIGINT) AS n_dropped,
        |  CAST(COALESCE(ms.n_docs_affected, 0) AS BIGINT) AS n_docs_affected
        |FROM t LEFT JOIN ps USING (threshold) LEFT JOIN ms USING (threshold)""".stripMargin,

    "q218_pq_staleness" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id % 2 = 0 AND c.vec_id < 64
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, qdist, vec_id % 2 = 1 AS is_delta FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |), agg AS (
        |  SELECT CAST(sub AS INT) AS subspace,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
        |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN qdist ELSE 0 END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS DOUBLE) / 1e8 AS err_index,
        |    CAST(SUM(CASE WHEN is_delta THEN qdist ELSE 0 END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS DOUBLE) / 1e8 AS err_delta
        |  FROM enc GROUP BY sub
        |)
        |SELECT subspace, n_index, n_delta, err_index, err_delta,
        |  err_delta / nullif(err_index, 0) AS staleness_ratio
        |FROM agg""".stripMargin,

    "q219_skew_profile" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
        |), totals AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys FROM counts
        |)
        |SELECT c.user_id, c.cnt AS n_rows_key, t.n_rows, t.n_keys,
        |  CAST(c.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS row_share,
        |  CAST(c.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) * CAST(t.n_keys AS DOUBLE) AS skew_factor
        |FROM (SELECT * FROM counts ORDER BY cnt DESC, user_id LIMIT 10) c
        |CROSS JOIN totals t""".stripMargin,

    "q220_join_cardinality" ->
      """WITH lc AS (
        |  SELECT user_id AS key, COUNT(*) AS cnt_left FROM events GROUP BY 1
        |), rc AS (
        |  SELECT o_custkey AS key, COUNT(*) AS cnt_right FROM orders GROUP BY 1
        |), contrib AS (
        |  SELECT lc.key, cnt_left, cnt_right, cnt_left * cnt_right AS contribution
        |  FROM lc JOIN rc USING (key)
        |), totals AS (
        |  SELECT CAST(SUM(contribution) AS BIGINT) AS est_rows,
        |         COUNT(*) AS n_join_keys FROM contrib
        |)
        |SELECT c.key, c.cnt_left, c.cnt_right, c.contribution,
        |  t.est_rows, t.n_join_keys,
        |  CAST(c.contribution AS DOUBLE) / CAST(t.est_rows AS DOUBLE) AS share
        |FROM (SELECT * FROM contrib ORDER BY contribution DESC, key LIMIT 10) c
        |CROSS JOIN totals t""".stripMargin,

    // q221: norms are exact int64 on the 1e8 grid (per-element quantized
    // squares, integer-summed), one correctly-rounded sqrt per row —
    // empty arrays coalesce to 0 (DuckDB list_sum of [] is NULL, the JVM
    // fold is 0), non-finite vectors get NULL norms in both engines.
    "q221_embedding_hygiene" ->
      """WITH v AS (
        |  SELECT label, len(embedding) AS dim,
        |    len(list_filter(embedding, e -> NOT isfinite(e))) > 0 AS bad,
        |    embedding
        |  FROM embeddings
        |), n AS (
        |  SELECT label, dim, bad,
        |    CASE WHEN NOT bad THEN CAST(floor(sqrt(CAST(coalesce(
        |      list_sum(list_transform(embedding,
        |        e -> CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |           * CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT))),
        |      0) AS DOUBLE)) + 0.5) AS BIGINT) END AS norm_fp
        |  FROM v
        |)
        |SELECT label, COUNT(*) AS n_vecs, MIN(dim) AS dim_min, MAX(dim) AS dim_max,
        |  CAST(SUM(CASE WHEN norm_fp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
        |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite_vecs,
        |  COUNT(norm_fp) AS n_finite,
        |  MIN(norm_fp) AS norm_min_fp, MAX(norm_fp) AS norm_max_fp,
        |  CAST(SUM(norm_fp) AS BIGINT) AS norm_sum_fp,
        |  CAST(SUM(norm_fp) AS DOUBLE) / CAST(COUNT(norm_fp) AS DOUBLE) / 1e8 AS norm_mean
        |FROM n GROUP BY label""".stripMargin,

    // q222: q195's minhash CTE, then per banding config one band explode
    // + per-bucket counts — candidate volume is Σ n(n−1)/2 over buckets,
    // no pair ever materialized (the planner prices the join it avoids).
    "q222_lsh_cost_planner" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), k81 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0) WHEN 1 THEN md5(mh1) WHEN 2 THEN md5(mh2)
        |    WHEN 3 THEN md5(mh3) WHEN 4 THEN md5(mh4) WHEN 5 THEN md5(mh5)
        |    WHEN 6 THEN md5(mh6) ELSE md5(mh7) END AS bkey
        |  FROM mh, range(0, 8) t(band)
        |), k42 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |    WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), k24 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3)
        |    ELSE md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 2) t(band)
        |), b81 AS (SELECT band, bkey, COUNT(*) AS n FROM k81 GROUP BY 1, 2),
        |   b42 AS (SELECT band, bkey, COUNT(*) AS n FROM k42 GROUP BY 1, 2),
        |   b24 AS (SELECT band, bkey, COUNT(*) AS n FROM k24 GROUP BY 1, 2)
        |SELECT CAST(8 AS BIGINT) AS bands, CAST(1 AS BIGINT) AS rows_per_band,
        |  COUNT(*) AS n_buckets,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
        |  MAX(n) AS max_bucket, CAST(SUM(n * (n - 1)) // 2 AS BIGINT) AS n_candidates
        |FROM b81
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), CAST(2 AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  MAX(n), CAST(SUM(n * (n - 1)) // 2 AS BIGINT)
        |FROM b42
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  MAX(n), CAST(SUM(n * (n - 1)) // 2 AS BIGINT)
        |FROM b24""".stripMargin,

    // q223: dominant-language tie-break is max-of-struct (count, then
    // lexicographically greatest lang) — mirrored by ORDER BY n DESC,
    // lang DESC here.
    "q223_source_manifest" ->
      """WITH base AS (
        |  SELECT source, lang, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, n_chars
        |  FROM documents
        |), pl AS (
        |  SELECT source, lang, COUNT(*) AS n, CAST(SUM(toks) AS BIGINT) AS toks,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM base GROUP BY 1, 2
        |), ps AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |    CAST(SUM(chars) AS BIGINT) AS n_chars, COUNT(*) AS n_langs
        |  FROM pl GROUP BY 1
        |), top AS (
        |  SELECT source, lang AS top_lang, n AS top_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, lang DESC) AS rk FROM pl
        |  ) WHERE rk = 1
        |), dt AS (
        |  SELECT source, COUNT(*) AS n_distinct_texts
        |  FROM (SELECT DISTINCT source, h FROM base) GROUP BY 1
        |)
        |SELECT ps.source, n_docs, n_tokens, ps.n_chars, n_langs, top_lang,
        |  CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share,
        |  n_distinct_texts,
        |  1.0 - CAST(n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
        |FROM ps JOIN top USING (source) JOIN dt USING (source)""".stripMargin,

    // q224: q216's stopword-ratio bins, best band first, md5-shuffled
    // within band — the global rank is total-ordered by
    // (bin DESC, md5('cur|'||doc_id), doc_id).
    "q224_curriculum_order" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    LEAST(CAST(floor(CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) * 10) AS BIGINT), 9) AS bin,
        |    md5('cur|' || CAST(doc_id AS VARCHAR)) AS tb
        |  FROM documents
        |)
        |SELECT doc_id, bin,
        |  row_number() OVER (ORDER BY bin DESC, tb, doc_id) AS curriculum_rank
        |FROM d""".stripMargin,

    // q225: q208's unrolled fixed-point Lloyd assignment chain verbatim
    // (k=8, iters=2), then rank-striped cell→shard placement over the
    // 8-row count table.
    "q225_shard_plan" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), counts AS (
        |  SELECT cid, COUNT(*) AS n_vecs FROM assign GROUP BY 1
        |), striped AS (
        |  SELECT cid, n_vecs,
        |    (row_number() OVER (ORDER BY n_vecs DESC, cid) - 1) % 4 AS shard
        |  FROM counts
        |), tot AS (
        |  SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM counts
        |)
        |SELECT s.shard, COUNT(*) AS n_cells,
        |  CAST(SUM(s.n_vecs) AS BIGINT) AS n_vecs, t.n_total,
        |  CAST(SUM(s.n_vecs) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
        |  CAST(SUM(s.n_vecs) AS DOUBLE) / CAST(t.n_total AS DOUBLE) * 4 AS imbalance
        |FROM striped s CROSS JOIN tot t
        |GROUP BY s.shard, t.n_total""".stripMargin,

    // q226: q18's classifier CTE grouped into the (labelled, predicted)
    // confusion matrix with per-label recall.
    "q226_langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labelled, string_split(text, ' ') AS w FROM documents
        |), sc AS (
        |  SELECT doc_id, labelled,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','que','los'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('le','les','des','et','une'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS s_de
        |  FROM t
        |), pred AS (
        |  SELECT labelled,
        |    CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
        |         WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
        |         ELSE 'de' END AS predicted
        |  FROM sc
        |), cm AS (
        |  SELECT labelled, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
        |), tot AS (
        |  SELECT labelled, CAST(SUM(n) AS BIGINT) AS n_labelled FROM cm GROUP BY 1
        |)
        |SELECT cm.labelled, cm.predicted, cm.n, t.n_labelled,
        |  CAST(cm.n AS DOUBLE) / CAST(t.n_labelled AS DOUBLE) AS recall
        |FROM cm JOIN tot t USING (labelled)""".stripMargin,

    // q227: q56's recursive-CTE connected components, rolled up into the
    // cluster-size distribution.
    "q227_cluster_sizes" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), cl AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |  FROM reach GROUP BY src
        |), sz AS (
        |  SELECT cluster, COUNT(*) AS cluster_size FROM cl GROUP BY 1
        |)
        |SELECT cluster_size, COUNT(*) AS n_clusters,
        |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY 1""".stripMargin,

    "q228_manifest_merge" ->
      // identical to q223: the incremental merge must reproduce the
      // full-corpus card bit-for-bit
      """WITH base AS (
        |  SELECT source, lang, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, n_chars
        |  FROM documents
        |), pl AS (
        |  SELECT source, lang, COUNT(*) AS n, CAST(SUM(toks) AS BIGINT) AS toks,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM base GROUP BY 1, 2
        |), ps AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |    CAST(SUM(chars) AS BIGINT) AS n_chars, COUNT(*) AS n_langs
        |  FROM pl GROUP BY 1
        |), top AS (
        |  SELECT source, lang AS top_lang, n AS top_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, lang DESC) AS rk FROM pl
        |  ) WHERE rk = 1
        |), dt AS (
        |  SELECT source, COUNT(*) AS n_distinct_texts
        |  FROM (SELECT DISTINCT source, h FROM base) GROUP BY 1
        |)
        |SELECT ps.source, n_docs, n_tokens, ps.n_chars, n_langs, top_lang,
        |  CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share,
        |  n_distinct_texts,
        |  1.0 - CAST(n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
        |FROM ps JOIN top USING (source) JOIN dt USING (source)""".stripMargin,

    // q229: exact integer moments on the 1e4 grid; cov is the one double
    // division (n*sxy - sx*sy)/n^2/1e8 in the same op order both engines.
    "q229_embedding_covariance" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), pr AS (
        |  SELECT a.pos - 1 AS i, b.pos - 1 AS j, a.qx * b.qx AS xy, a.qx AS x, b.qx AS y
        |  FROM qe a JOIN qe b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |)
        |SELECT i, j, COUNT(*) AS n, CAST(SUM(xy) AS BIGINT) AS sxy,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(COUNT(*) * CAST(SUM(xy) AS BIGINT) - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) * COUNT(*) AS DOUBLE) / 1e8 AS cov
        |FROM pr GROUP BY 1, 2""".stripMargin,

    // q230: q229's moment chain, downscaled (floor(c/2^30+0.5) in double
    // -- exact power-of-two scaling), mirrored to the full matrix, then
    // 4 unrolled power-iteration steps; norms via exact HUGEINT sums
    // with the VARCHAR->DOUBLE parse (DuckDB's direct HUGEINT cast is
    // not correctly rounded past 2^53).
    "q230_pca_power" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), pr AS (
        |  SELECT a.pos - 1 AS i, b.pos - 1 AS j, a.qx * b.qx AS xy, a.qx AS x, b.qx AS y
        |  FROM qe a JOIN qe b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |), cu AS (
        |  SELECT i, j, CAST(floor(CAST(COUNT(*) * CAST(SUM(xy) AS BIGINT)
        |      - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
        |      / 1073741824.0 + 0.5) AS BIGINT) AS c
        |  FROM pr GROUP BY 1, 2
        |), cm AS (
        |  SELECT i, j, c FROM cu
        |  UNION ALL
        |  SELECT j AS i, i AS j, c FROM cu WHERE i <> j
        |), v0 AS (
        |  SELECT CAST(i AS INT) AS vi, CAST(1000000 AS BIGINT) AS val FROM range(0, 64) t(i)
|), w1 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v0 v ON m.j = v.vi GROUP BY m.i
        |), n1 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w1
        |), v1 AS (
        |  SELECT CAST(w1.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w1, n1
|), w2 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v1 v ON m.j = v.vi GROUP BY m.i
        |), n2 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w2
        |), v2 AS (
        |  SELECT CAST(w2.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w2, n2
|), w3 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v2 v ON m.j = v.vi GROUP BY m.i
        |), n3 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w3
        |), v3 AS (
        |  SELECT CAST(w3.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w3, n3
|), w4 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v3 v ON m.j = v.vi GROUP BY m.i
        |), n4 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w4
        |), v4 AS (
        |  SELECT CAST(w4.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w4, n4
|), cv AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS cv
        |  FROM cm m JOIN v4 v ON m.j = v.vi GROUP BY m.i
        |), num AS (
        |  SELECT SUM(CAST(cv.cv AS HUGEINT) * v.val) AS num FROM cv JOIN v4 v ON cv.i = v.vi
        |), den AS (
        |  SELECT CAST(SUM(val * val) AS BIGINT) AS den FROM v4
        |), tr AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS tr FROM cm WHERE i = j
        |)
        |SELECT v.vi AS dim, CAST(v.val AS DOUBLE) / 1e6 AS loading,
        |  CAST(CAST(num.num AS VARCHAR) AS DOUBLE) / nullif(CAST(den.den AS DOUBLE), 0.0)
        |    / nullif(CAST(tr.tr AS DOUBLE), 0.0) AS var_share
        |FROM v4 v CROSS JOIN num CROSS JOIN den CROSS JOIN tr""".stripMargin,

    // q231: exact HUGEINT moments, VARCHAR->DOUBLE parses (DuckDB's
    // direct HUGEINT cast is not correctly rounded past 2^53, Spark's
    // BigDecimal path is).
    "q231_modality_alignment" ->
      """WITH nf AS (
        |  SELECT vec_id AS doc_id,
        |    CAST(floor(sqrt(CAST(coalesce(list_sum(list_transform(embedding,
        |      e -> CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |         * CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT))), 0) AS DOUBLE))
        |      + 0.5) AS BIGINT) AS norm_fp
        |  FROM embeddings
        |), j AS (
        |  SELECT d.lang, d.n_chars, nf.norm_fp
        |  FROM documents d JOIN nf USING (doc_id)
        |), m AS (
        |  SELECT lang, COUNT(*) AS n,
        |    SUM(CAST(n_chars AS HUGEINT)) AS sx,
        |    SUM(CAST(norm_fp AS HUGEINT)) AS sy,
        |    SUM(CAST(n_chars AS HUGEINT) * norm_fp) AS sxy,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx,
        |    SUM(CAST(norm_fp AS HUGEINT) * norm_fp) AS syy
        |  FROM j GROUP BY 1
        |)
        |SELECT lang, n,
        |  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        |    / sqrt(nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
        |                  * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE), 0.0)) AS corr,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars,
        |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) / 1e8 AS mean_norm
        |FROM m""".stripMargin,

    "q232_group_kfold" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  CAST((row_number() OVER (ORDER BY n_docs DESC, source) - 1) % 5 AS BIGINT) AS fold
        |FROM c""".stripMargin,

    "q233_rebalance_plan" ->
      """WITH c AS (
        |  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
        |), t AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS target FROM c
        |)
        |SELECT c.label, c.n, t.target,
        |  (t.target * 1000000) // c.n AS factor_fp,
        |  CAST(t.target - c.n AS DOUBLE) / CAST(c.n AS DOUBLE) AS oversample_extra
        |FROM c CROSS JOIN t""".stripMargin,

    // q234: q22's verified LSH pair CTEs at threshold 0.8 (the shared
    // dedup pair relation — round 18 moved this audit off the quadratic
    // truth, the repo's only super-linear chain) + q40's md5-nibble
    // split, rolled up by (split_a, split_b).
    "q234_split_leakage" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), p AS (
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |), sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 80 THEN 'train'
        |                      WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id,
        |      ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |    FROM documents
        |  )
        |)
        |SELECT sa.split AS split_a, sb.split AS split_b, COUNT(*) AS n_pairs,
        |  sa.split <> sb.split AS is_leak
        |FROM p JOIN sp sa ON p.doc_a = sa.doc_id JOIN sp sb ON p.doc_b = sb.doc_id
        |GROUP BY 1, 2, 4""".stripMargin,

    // q235: q61's trained-IVF chain (verbatim, through `scored`) + the
    // exact brute-force top-5 from the shared qe/vn moments, rolled into
    // per-query recall@5.
    "q235_ivf_recall" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM cand c JOIN qe qa ON qa.vec_id = c.query_id
        |  JOIN qe qb ON qb.vec_id = c.neighbor_id AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN vn nq ON nq.vec_id = n.query_id JOIN vn nn ON nn.vec_id = n.neighbor_id
        |)
        |, ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT s.query_id, s.neighbor_id,
        |      row_number() OVER (PARTITION BY s.query_id ORDER BY s.cosine DESC, s.neighbor_id) AS rn
        |    FROM scored s
        |  ) WHERE rn <= 5
        |), bfd AS (
        |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM qe qa JOIN qe qb ON qb.pos = qa.pos AND qb.vec_id != qa.vec_id
        |  WHERE qa.vec_id < 10 GROUP BY 1, 2
        |), bf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |      row_number() OVER (PARTITION BY d.query_id
        |        ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(vq.n2 AS DOUBLE)) * sqrt(CAST(vb.n2 AS DOUBLE))) DESC, d.neighbor_id) AS rn
        |    FROM bfd d JOIN vn vq ON vq.vec_id = d.query_id JOIN vn vb ON vb.vec_id = d.neighbor_id
        |  ) WHERE rn <= 5
        |), hits AS (
        |  SELECT bf.query_id, COUNT(*) AS n_hit
        |  FROM bf JOIN ivf ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
        |  GROUP BY 1
        |), tru AS (
        |  SELECT query_id, COUNT(*) AS n_truth FROM bf GROUP BY 1
        |)
        |SELECT t.query_id, t.n_truth,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / nullif(CAST(t.n_truth AS DOUBLE), 0.0) AS recall
        |FROM tru t LEFT JOIN hits h USING (query_id)""".stripMargin,

    // q236: add-one bigram LM fluency — every term is one integer floor
    // division on the 1e6 grid (no transcendental ln, see scaladoc); the
    // per-doc sum goes through the VARCHAR→DOUBLE parse (DuckDB's direct
    // HUGEINT→DOUBLE cast is not correctly rounded past 2^53).
    "q236_lm_fluency" ->
      """WITH bg AS (
        |  SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  )
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY 1
        |), h1 AS (
        |  SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1
        |), voc AS (
        |  SELECT COUNT(*) AS v FROM h1
        |), sc AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    SUM((1000000 * (h1.n1 + voc.v)) // (b2.n12 + 1)) AS s
        |  FROM bg JOIN b2 USING (bigram) JOIN h1 USING (w1) CROSS JOIN voc
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_p
        |FROM sc""".stripMargin,

    // q237: Gopher/MassiveText intra-doc repetition rules — exact integer
    // counts, two double-division ratios, 0.20 top-share flag.
    "q237_repetition_profile" ->
      """WITH g AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), pg AS (
        |  SELECT doc_id, g, COUNT(*) AS n FROM g GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, SUM(n) AS n_grams, MAX(n) AS top_gram_n,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1
        |)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_share,
        |  CAST(dup_mass AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_share,
        |  CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE) > 0.20 AS flagged
        |FROM agg""".stripMargin,

    // q238: KMV key-overlap sketches — the q209 min-k idiom on both key
    // populations plus their union, inclusion-exclusion overlap, exact
    // below k=64, the 63<<48 inversion above.
    "q238_key_overlap" ->
      """WITH hx AS (
        |  SELECT DISTINCT 'a' AS side, md5(CAST(o_custkey AS VARCHAR)) AS m FROM orders
        |  WHERE o_custkey IS NOT NULL
        |  UNION
        |  SELECT DISTINCT 'b', md5(CAST(user_id AS VARCHAR)) FROM events
        |  WHERE user_id IS NOT NULL
        |), hh AS (
        |  SELECT side, m,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM hx, range(0, 12) r(j) GROUP BY side, m
        |), ka AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM hh WHERE side = 'a'
        |), kb AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM hh WHERE side = 'b'
        |), ku AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM (SELECT DISTINCT h FROM hh)
        |), est AS (
        |  SELECT
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM ka) AS ndv_a,
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM kb) AS ndv_b,
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM ku) AS ndv_union
        |), ov AS (
        |  SELECT ndv_a, ndv_b, ndv_union,
        |    GREATEST(CAST(0 AS BIGINT), ndv_a + ndv_b - ndv_union) AS ndv_overlap
        |  FROM est
        |)
        |SELECT ndv_a, ndv_b, ndv_union, ndv_overlap,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_a AS DOUBLE), 0.0) AS containment_a,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_b AS DOUBLE), 0.0) AS containment_b,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_union AS DOUBLE), 0.0) AS jaccard
        |FROM ov""".stripMargin,

    // q239: mergeable quantile sketch — bottom-k row sample keyed by the
    // md5-derived 48-bit hash of the (orderkey, linenumber) identity,
    // k=256 smallest DISTINCT (h, v) pairs per flag, nearest-rank picks
    // over the sample's value order in pure integer arithmetic.
    "q239_price_quantile_sketch" ->
      """WITH rws AS (
        |  SELECT l_returnflag AS flag,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS mm,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem
        |), hh AS (
        |  SELECT flag, v,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY flag, mm, v
        |), dist AS (
        |  SELECT DISTINCT flag, h, v FROM hh
        |), samp AS (
        |  SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY h, v) AS rn
        |  FROM dist
        |), kept AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS vr,
        |    COUNT(*) OVER (PARTITION BY flag) AS m
        |  FROM samp WHERE rn <= 256
        |), tot AS (
        |  SELECT l_returnflag AS flag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
        |)
        |SELECT t.flag, t.n_rows, CAST(MAX(k.m) AS BIGINT) AS sample_n,
        |  MAX(CASE WHEN vr = (m + 1) // 2 THEN v END) AS p50_c,
        |  MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN v END) AS p90_c,
        |  MAX(CASE WHEN vr = (99 * m + 99) // 100 THEN v END) AS p99_c
        |FROM kept k JOIN tot t ON k.flag = t.flag
        |GROUP BY t.flag, t.n_rows""".stripMargin,

    // q240: the same sketch per tumbling day over event values — the
    // registered batch twin of StreamingOps.quantileMonitor (the q209
    // twin discipline), identity = event_id.
    "q240_daily_value_quantiles" ->
      """WITH rws AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
        |    md5(CAST(event_id AS VARCHAR)) AS mm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events
        |), hh AS (
        |  SELECT w_start, v,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY w_start, mm, v
        |), dist AS (
        |  SELECT DISTINCT w_start, h, v FROM hh
        |), samp AS (
        |  SELECT w_start, v, row_number() OVER (PARTITION BY w_start ORDER BY h, v) AS rn
        |  FROM dist
        |), kept AS (
        |  SELECT w_start, v,
        |    row_number() OVER (PARTITION BY w_start ORDER BY v) AS vr,
        |    COUNT(*) OVER (PARTITION BY w_start) AS m
        |  FROM samp WHERE rn <= 256
        |), tot AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT t.w_start, t.n_events, CAST(MAX(k.m) AS BIGINT) AS sample_n,
        |  MAX(CASE WHEN vr = (m + 1) // 2 THEN v END) AS p50_c,
        |  MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN v END) AS p90_c,
        |  MAX(CASE WHEN vr = (99 * m + 99) // 100 THEN v END) AS p99_c
        |FROM kept k JOIN tot t ON k.w_start = t.w_start
        |GROUP BY t.w_start, t.n_events""".stripMargin,

    // q241: priority sampling — k+1 highest (w*2^64 // (h+1)) priorities
    // per source (ties by h, w), exact integer cross-product estimator
    // with one final double division; the exact total rides alongside so
    // the error ratio is itself oracle-checked.
    "q241_mass_estimate" ->
      """WITH rws AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS w,
        |    md5(CAST(doc_id AS VARCHAR)) AS mm
        |  FROM documents
        |), hh AS (
        |  SELECT source, w,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY source, mm, w
        |), dist AS (
        |  SELECT DISTINCT source, w, h FROM hh
        |), sel AS (
        |  SELECT source, w, h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (w::HUGEINT * 18446744073709551616) // (h + 1) DESC, h ASC, w ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS m
        |  FROM dist
        |), tau AS (
        |  SELECT source, w AS wt, h AS ht FROM sel WHERE rn = 17
        |), agg AS (
        |  SELECT s.source, MAX(s.m) AS m, MAX(t.ht) AS ht,
        |    SUM(s.w) AS sum_all,
        |    SUM(CASE WHEN s.rn <= 16 THEN
        |      GREATEST(s.w::HUGEINT * 65536 * (t.ht + 1),
        |               t.wt::HUGEINT * 18446744073709551616) END) AS sum_terms
        |  FROM sel s LEFT JOIN tau t ON t.source = s.source
        |  GROUP BY s.source
        |), tot AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source
        |), fin AS (
        |  SELECT t.source, t.n_docs, t.total_chars,
        |    CAST(LEAST(a.m, 16) AS BIGINT) AS sample_n,
        |    CASE WHEN a.m <= 16 THEN CAST(a.sum_all AS DOUBLE)
        |         ELSE CAST(a.sum_terms AS DOUBLE) / 65536.0 / CAST(a.ht + 1 AS DOUBLE)
        |    END AS est_chars
        |  FROM tot t JOIN agg a ON a.source = t.source
        |)
        |SELECT source, n_docs, total_chars, sample_n, est_chars,
        |  est_chars / CAST(total_chars AS DOUBLE) AS err_ratio
        |FROM fin""".stripMargin,

    "q242_bm25_topdocs" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), pd AS (
        |  SELECT doc_id, COUNT(*) AS dl,
        |    CAST(SUM(CASE WHEN word = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |    CAST(SUM(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
        |    CAST(SUM(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
        |  FROM w GROUP BY 1
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s,
        |    CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
        |    CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
        |    CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window
        |  FROM pd
        |), sc AS (
        |  SELECT doc_id, dl, tf_spark, tf_merge, tf_window,
        |    ((CASE WHEN tf_spark > 0 THEN
        |        CAST(CAST(2*n - 2*df_spark + 1 AS HUGEINT) * (CAST(tf_spark AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_spark + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_spark*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END
        |    + CASE WHEN tf_merge > 0 THEN
        |        CAST(CAST(2*n - 2*df_merge + 1 AS HUGEINT) * (CAST(tf_merge AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_merge + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_merge*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END)
        |    + CASE WHEN tf_window > 0 THEN
        |        CAST(CAST(2*n - 2*df_window + 1 AS HUGEINT) * (CAST(tf_window AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_window + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_window*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END) AS score
        |  FROM pd, st
        |)
        |SELECT doc_id, dl, tf_spark, tf_merge, tf_window, score, CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        |  FROM sc WHERE score > 0
        |) WHERE rnk <= 15""".stripMargin,

    "q243_hybrid_rrf" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), pd AS (
        |  SELECT doc_id, COUNT(*) AS dl,
        |    CAST(SUM(CASE WHEN word = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |    CAST(SUM(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
        |    CAST(SUM(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
        |  FROM w GROUP BY 1
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s,
        |    CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
        |    CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
        |    CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window
        |  FROM pd
        |), sc AS (
        |  SELECT doc_id,
        |    ((CASE WHEN tf_spark > 0 THEN
        |        CAST(CAST(2*n - 2*df_spark + 1 AS HUGEINT) * (CAST(tf_spark AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_spark + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_spark*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END
        |    + CASE WHEN tf_merge > 0 THEN
        |        CAST(CAST(2*n - 2*df_merge + 1 AS HUGEINT) * (CAST(tf_merge AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_merge + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_merge*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END)
        |    + CASE WHEN tf_window > 0 THEN
        |        CAST(CAST(2*n - 2*df_window + 1 AS HUGEINT) * (CAST(tf_window AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_window + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_window*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END) AS score
        |  FROM pd, st
        |), lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
        |  FROM sc WHERE score > 0 QUALIFY lex_rank <= 64
        |), q AS (
        |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
        |), pairs AS (
        |  SELECT e.vec_id AS doc_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != 0
        |  GROUP BY 1
        |), dense AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) DESC, doc_id) AS INT) AS dense_rank
        |  FROM pairs QUALIFY dense_rank <= 64
        |)
        |SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
        |  (COALESCE(1.0 / (60 + l.lex_rank), 0.0) + COALESCE(1.0 / (60 + d.dense_rank), 0.0)) AS rrf
        |FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    "q244_source_ols" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2
        |), pd AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS y, COUNT(*) AS ndw FROM tf GROUP BY 1
        |), feat AS (
        |  SELECT d.source, d.n_chars AS x1, p.ndw AS x2, p.y
        |  FROM documents d JOIN pd p USING (doc_id)
        |), m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x1 AS HUGEINT)) AS sx1, SUM(CAST(x2 AS HUGEINT)) AS sx2,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x1 * x1 AS HUGEINT)) AS sx11,
        |    SUM(CAST(x1 * x2 AS HUGEINT)) AS sx12,
        |    SUM(CAST(x2 * x2 AS HUGEINT)) AS sx22,
        |    SUM(CAST(x1 * y AS HUGEINT)) AS sx1y,
        |    SUM(CAST(x2 * y AS HUGEINT)) AS sx2y,
        |    SUM(CAST(y * y AS HUGEINT)) AS syy
        |  FROM feat GROUP BY 1
        |), dd AS (
        |  SELECT source, n,
        |    CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS dx1,
        |    CAST(sx2 AS DOUBLE) AS dx2, CAST(sy AS DOUBLE) AS dy,
        |    CAST(sx11 AS DOUBLE) AS dx11, CAST(sx12 AS DOUBLE) AS dx12,
        |    CAST(sx22 AS DOUBLE) AS dx22, CAST(sx1y AS DOUBLE) AS dx1y,
        |    CAST(sx2y AS DOUBLE) AS dx2y, CAST(syy AS DOUBLE) AS dyy
        |  FROM m
        |), solved AS (
        |  SELECT source, n, dy, dx1y, dx2y, dyy, dn,
        |    ((dn * (dx11 * dx22 - dx12 * dx12)
        |      - dx1 * (dx1 * dx22 - dx12 * dx2)) + dx2 * (dx1 * dx12 - dx11 * dx2)) AS det,
        |    ((dy * (dx11 * dx22 - dx12 * dx12)
        |      - dx1 * (dx1y * dx22 - dx12 * dx2y)) + dx2 * (dx1y * dx12 - dx11 * dx2y)) AS det0,
        |    ((dn * (dx1y * dx22 - dx12 * dx2y)
        |      - dy * (dx1 * dx22 - dx12 * dx2)) + dx2 * (dx1 * dx2y - dx1y * dx2)) AS det1,
        |    ((dn * (dx11 * dx2y - dx1y * dx12)
        |      - dx1 * (dx1 * dx2y - dx1y * dx2)) + dy * (dx1 * dx12 - dx11 * dx2)) AS det2
        |  FROM dd
        |), beta AS (
        |  SELECT source, n, dy, dx1y, dx2y, dyy, dn,
        |    det0 / nullif(det, 0.0) AS beta0,
        |    det1 / nullif(det, 0.0) AS beta1,
        |    det2 / nullif(det, 0.0) AS beta2
        |  FROM solved
        |)
        |SELECT source, n, beta0, beta1, beta2,
        |  (1.0 - (dyy - ((beta0 * dy + beta1 * dx1y) + beta2 * dx2y))
        |       / nullif(dyy - (dy * dy) / dn, 0.0)) AS r2
        |FROM beta""".stripMargin,

    // q245: log-free NB source classifier — integer inverse-probability
    // micro-units (the q236 grid), salted-md5 half trains, other half
    // scores, argmin with class-name tie-break, confusion counts out.
    "q245_nb_confusion" ->
      """WITH fold AS (
        |  SELECT doc_id, source, text,
        |    ( (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 2 AS b
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, source, b, unnest(string_split(text, ' ')) AS word
        |  FROM fold
        |), cw AS (
        |  SELECT source, word, COUNT(*) AS cnt FROM w
        |  WHERE b = 0 GROUP BY 1, 2
        |), voc AS (
        |  SELECT COUNT(DISTINCT word) AS v FROM cw
        |), classes AS (
        |  SELECT source AS cand, 1000000 * (SUM(cnt) + voc.v) AS unseen
        |  FROM cw CROSS JOIN voc GROUP BY 1, voc.v
        |), delta AS (
        |  SELECT cw.word, c.cand,
        |    c.unseen // (cw.cnt + 1) - c.unseen AS delta
        |  FROM cw JOIN classes c ON cw.source = c.cand
        |), tf AS (
        |  SELECT doc_id, source, word, COUNT(*) AS tf FROM w
        |  WHERE b = 1 GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT doc_id, source, SUM(tf) AS t FROM tf GROUP BY 1, 2
        |), adj AS (
        |  SELECT tf.doc_id, d.cand, SUM(tf.tf * d.delta) AS adj
        |  FROM tf JOIN delta d USING (word) GROUP BY 1, 2
        |), sc AS (
        |  SELECT tot.doc_id, tot.source, c.cand,
        |    tot.t * c.unseen + COALESCE(adj.adj, 0) AS score
        |  FROM tot CROSS JOIN classes c
        |  LEFT JOIN adj ON adj.doc_id = tot.doc_id AND adj.cand = c.cand
        |), pred AS (
        |  SELECT doc_id, source, cand AS predicted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score, cand) AS rn
        |  FROM sc
        |)
        |SELECT source, predicted, COUNT(*) AS n
        |FROM pred WHERE rn = 1 GROUP BY 1, 2""".stripMargin,

    // q246: Mann-Whitney AUC of the dup-bigram-share micro score
    // predicting lang='en', per source — exact tie-corrected midranks
    // over per-(source, score) counts, one trailing double division.
    "q246_score_auc" ->
      """WITH g0 AS (
        |  SELECT doc_id, source, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, pos, g, COUNT(*) AS n FROM g0
        |  GROUP BY 1, 2, 3, 4
        |), ds AS (
        |  SELECT doc_id, source, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT source, pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT source, s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, s, n, npos,
        |    COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM cnts
        |), agg AS (
        |  SELECT source, SUM(npos) AS npos, SUM(n - npos) AS nneg,
        |    SUM(npos * (2 * below + n + 1)) AS r2
        |  FROM cum GROUP BY 1
        |)
        |SELECT source, CAST(npos AS BIGINT) AS npos,
        |  CAST(nneg AS BIGINT) AS nneg,
        |  CAST(CAST(r2 - npos * (npos + 1) AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(2 * npos * nneg AS DOUBLE), 0.0) AS auc
        |FROM agg""".stripMargin,

    // q247: reliability bins of the same micro score — fixed 11-bin
    // grid, exact integer sums, fixed (double/1e6)/n division chain.
    "q247_calibration_bins" ->
      """WITH g0 AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, pos, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), b AS (
        |  SELECT s // 100000 AS bin, COUNT(*) AS n, SUM(s) AS s_sum,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, n,
        |  CAST(CAST(s_sum AS VARCHAR) AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)
        |    AS mean_score,
        |  CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
        |FROM b""".stripMargin,

    // q248: 4x1024 count-min sketch over the vocabulary — salted 16-bit
    // md5 row hashes mod w, exact integer cells, min-of-rows estimates
    // for the exact top-20 probes.
    "q248_cm_freq_audit" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1
        |), hashed AS (
        |  SELECT word, n, r,
        |    ( (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 4, 1)) - 1) ) % 1024 AS b
        |  FROM v, range(0, 4) t(r)
        |), cells AS (
        |  SELECT r, b, SUM(n) AS cell FROM hashed GROUP BY 1, 2
        |), probes AS (
        |  SELECT word, n FROM v ORDER BY n DESC, word LIMIT 20
        |)
        |SELECT p.word, p.n, CAST(MIN(c.cell) AS BIGINT) AS cm_est,
        |  CAST(MIN(c.cell) AS BIGINT) - p.n AS overcount
        |FROM probes p
        |JOIN hashed h ON p.word = h.word
        |JOIN cells c ON h.r = c.r AND h.b = c.b
        |GROUP BY 1, 2""".stripMargin,

    // q249: Zipf tail fit — floor-log2 via binary string length (exact
    // in any engine), bounded-decade ccdf suffix sum, integer-moment OLS
    // with the q244 fixed parenthesisation.
    "q249_zipf_slope" ->
      """WITH freq AS (
        |  SELECT source, word, COUNT(*) AS f
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2
        |), spec AS (
        |  SELECT source, len(bin(f)) - 1 AS x, COUNT(*) AS nw
        |  FROM freq GROUP BY 1, 2
        |), pts AS (
        |  SELECT source, x,
        |    len(bin(SUM(nw) OVER (PARTITION BY source ORDER BY x DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) - 1 AS y
        |  FROM spec
        |), m AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy, SUM(y * y) AS syy
        |  FROM pts GROUP BY 1
        |), nrm AS (
        |  SELECT source, n,
        |    n * sxx - sx * sx AS sxxn,
        |    n * sxy - sx * sy AS sxyn,
        |    n * syy - sy * sy AS syyn
        |  FROM m
        |), fit AS (
        |  SELECT source, CAST(n AS BIGINT) AS n_decades,
        |    CAST(sxyn AS DOUBLE) / nullif(CAST(sxxn AS DOUBLE), 0.0) AS slope,
        |    CAST(sxyn * sxyn AS DOUBLE)
        |      / nullif(CAST(sxxn * syyn AS DOUBLE), 0.0) AS r2
        |  FROM nrm
        |)
        |SELECT source, n_decades, slope,
        |  -1.0 / nullif(slope, 0.0) AS zipf_s, r2
        |FROM fit""".stripMargin,

    // q250: reciprocal (best-buddy) nearest neighbours inside the q25
    // LSH buckets — per-vector argmax with smaller-id tie-break, then
    // the mutuality self-join.
    "q250_reciprocal_nn" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE))) AS cosine
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), directed AS (
        |  SELECT vec_a AS src, vec_b AS nbr, cosine FROM cos
        |  UNION ALL
        |  SELECT vec_b, vec_a, cosine FROM cos
        |), best AS (
        |  SELECT src, nbr, cosine FROM (
        |    SELECT src, nbr, cosine,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY cosine DESC, nbr ASC) AS rn
        |    FROM directed)
        |  WHERE rn = 1
        |)
        |SELECT x.src AS vec_a, x.nbr AS vec_b, x.cosine AS cosine
        |FROM best x JOIN best y
        |  ON x.src = y.nbr AND x.nbr = y.src AND x.src < x.nbr""".stripMargin,

    // q251: content-defined chunking — cut after each 8-char window
    // whose md5 starts with '0', md5 chunk fingerprints; per source the
    // within-source dup share plus the cross-source chunk-dup share
    // (instances whose fingerprint spans >1 distinct source).
    "q251_cdc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS l FROM documents
        |  WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, source, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT source,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT source, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), pf AS (
        |  SELECT source, fp, COUNT(*) AS n, SUM(clen) AS chars
        |  FROM ch GROUP BY 1, 2
        |), ns AS (
        |  SELECT fp, COUNT(*) AS nsrc FROM pf GROUP BY 1
        |)
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks,
        |  COUNT(*) AS n_distinct,
        |  CAST(SUM(chars) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |    AS mean_chunk_len,
        |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |    AS dup_chunk_share,
        |  CAST(SUM(CASE WHEN nsrc > 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_cross_chunks,
        |  CAST(SUM(CASE WHEN nsrc > 1 THEN n ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(n) AS DOUBLE) AS cross_dup_share
        |FROM pf JOIN ns USING (fp) GROUP BY 1""".stripMargin,

    // q252: Youden-J operating point of the dup-share screen per source
    // — integer argmax of |flagged_pos*nneg - flagged_neg*npos| over
    // observed thresholds (classify s >= t), smallest-t tie-break.
    "q252_youden_threshold" ->
      """WITH g0 AS (
        |  SELECT doc_id, source, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, pos, g, COUNT(*) AS n FROM g0
        |  GROUP BY 1, 2, 3, 4
        |), ds AS (
        |  SELECT doc_id, source, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT source, pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT source, s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, s, n, npos,
        |    SUM(n) OVER (PARTITION BY source ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl_n,
        |    SUM(npos) OVER (PARTITION BY source ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl_p
        |  FROM cnts
        |), tot AS (
        |  SELECT source, SUM(n) AS tn, SUM(npos) AS tp FROM cnts GROUP BY 1
        |), j AS (
        |  SELECT c.source, c.s, c.fl_n, c.fl_p, t.tn, t.tp,
        |    abs(c.fl_p * (t.tn - t.tp) - (c.fl_n - c.fl_p) * t.tp) AS jnum,
        |    row_number() OVER (PARTITION BY c.source
        |      ORDER BY abs(c.fl_p * (t.tn - t.tp) - (c.fl_n - c.fl_p) * t.tp) DESC,
        |               c.s ASC) AS rn
        |  FROM cum c JOIN tot t USING (source)
        |)
        |SELECT source, CAST(s AS BIGINT) AS threshold_micro,
        |  CAST(fl_p AS DOUBLE) / nullif(CAST(tp AS DOUBLE), 0.0) AS tpr,
        |  CAST(fl_n - fl_p AS DOUBLE) / nullif(CAST(tn - tp AS DOUBLE), 0.0) AS fpr,
        |  CAST(jnum AS DOUBLE)
        |    / nullif(CAST(tp * (tn - tp) AS DOUBLE), 0.0) AS j
        |FROM j WHERE rn = 1""".stripMargin,

    // q253: dynamic-partition-pruning probe — Q1 months via the
    // calendar-dim attribute filter; per-month counts/cents. The
    // pruning mechanism is asserted in PlanShapeSpec, the VALUES here.
    "q253_dpp_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |FROM orders
        |WHERE CAST(strftime(o_orderdate, '%m') AS INT) <= 3
        |GROUP BY 1""".stripMargin,

    // q254: per-source bigram LMs cross-scored on a salted-md5 doc
    // sample — the q236 micro grid with the monitor's left-join unseen
    // pricing, |sources|^2 cells out. Round 14: the sample predicate is
    // the fixed-probe-BUDGET contract (8 md5 hex digits mod 1e6 <
    // 200000 ppm — absolute probe mass), matching lmAffinityBudget;
    // the fraction-pinned 4-digit path is package-private now.
    "q254_lm_affinity" ->
      """WITH bgr AS (
        |  SELECT doc_id, source, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |          FROM documents)
        |  )
        |), b2 AS (
        |  SELECT source AS lm, bigram, COUNT(*) AS n12 FROM bgr GROUP BY 1, 2
        |), h1 AS (
        |  SELECT source AS lm, w1, COUNT(*) AS n1 FROM bgr GROUP BY 1, 2
        |), voc AS (
        |  SELECT lm, COUNT(*) AS v FROM h1 GROUP BY 1
        |), samp AS (
        |  SELECT * FROM bgr WHERE
        |    ( (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 8, 1)) - 1) ) % 1000000 < 200000
        |), sc AS (
        |  SELECT s.source, l.lm, COUNT(*) AS n_bigrams,
        |    SUM((1000000 * (COALESCE(h1.n1, 0) + l.v)) // (COALESCE(b2.n12, 0) + 1)) AS sp
        |  FROM samp s CROSS JOIN voc l
        |  LEFT JOIN b2 ON b2.lm = l.lm AND b2.bigram = s.bigram
        |  LEFT JOIN h1 ON h1.lm = l.lm AND h1.w1 = s.w1
        |  GROUP BY 1, 2
        |)
        |SELECT source, lm, n_bigrams,
        |  CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_p
        |FROM sc""".stripMargin,

    // q255: Pearson degree assortativity over the q22 verified near-dup
    // edges, symmetrised; exact integer moments, one trailing division.
    "q255_dup_assortativity" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM (SELECT doc_a, doc_b,
        |          len(list_intersect(da.shs, db.shs)) AS inter,
        |          len(da.shs) AS n_a, len(db.shs) AS n_b
        |        FROM cand JOIN d da ON doc_a = da.doc_id
        |        JOIN d db ON doc_b = db.doc_id)
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), deg AS (
        |  SELECT dd, COUNT(*) AS deg FROM (
        |    SELECT doc_a AS dd FROM pairs UNION ALL SELECT doc_b FROM pairs)
        |  GROUP BY 1
        |), e AS (
        |  SELECT da.deg AS x, db.deg AS y
        |  FROM pairs JOIN deg da ON pairs.doc_a = da.dd
        |  JOIN deg db ON pairs.doc_b = db.dd
        |), xy AS (
        |  SELECT x, y FROM e UNION ALL SELECT y, x FROM e
        |), m AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy
        |  FROM xy
        |)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_degree,
        |  CAST(CAST(n * sxy - sx * sx AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 0.0)
        |    AS assortativity
        |FROM m""".stripMargin,

    // q256: decile lift table — exact descending grid prefix ranks,
    // atomic tie groups, integer cross-product lifts.
    "q256_decile_lift" ->
      """WITH g0 AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, pos, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1
        |), cum AS (
        |  SELECT s, n, npos,
        |    COALESCE(SUM(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
        |  FROM cnts
        |), tot AS (
        |  SELECT SUM(n) AS nn, SUM(npos) AS np FROM cnts
        |), dd AS (
        |  SELECT least(9, (10 * above) // nn) AS decile, n, npos, nn, np
        |  FROM cum, tot
        |), agg AS (
        |  SELECT decile, SUM(n) AS n, SUM(npos) AS npos,
        |    MAX(nn) AS nn, MAX(np) AS np
        |  FROM dd GROUP BY 1
        |), c AS (
        |  SELECT decile, n, npos, nn, np,
        |    SUM(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    SUM(npos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_npos
        |  FROM agg
        |)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
        |  CAST(npos AS BIGINT) AS npos,
        |  CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS response_rate,
        |  CAST(CAST(npos * nn AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(n * np AS VARCHAR) AS DOUBLE), 0.0) AS lift,
        |  CAST(cum_npos AS DOUBLE) / nullif(CAST(np AS DOUBLE), 0.0)
        |    AS cum_capture,
        |  CAST(CAST(cum_npos * nn AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(cum_n * np AS VARCHAR) AS DOUBLE), 0.0)
        |    AS cum_lift
        |FROM c""".stripMargin,

    // q257: exact-substring dedup — positional 8-token window md5
    // fingerprints; shared iff min(doc_id) <> max(doc_id) per
    // fingerprint; per-doc interval union of [p, p+7] via
    // gaps-and-islands (break on gap > 8); longest span elected with
    // smallest-start tie-break, char offset from the token array.
    "q257_exact_substring" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8
        |), pos AS (
        |  SELECT doc_id, len(w) AS n_tokens, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM t)
        |), dup AS (
        |  SELECT fp FROM pos GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)
        |), sp AS (
        |  SELECT pos.doc_id, pos.n_tokens, pos.p FROM pos JOIN dup USING (fp)
        |), isl AS (
        |  SELECT doc_id, n_tokens, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, n_tokens, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), spans AS (
        |  SELECT doc_id, n_tokens, island,
        |    MIN(p) AS s, MAX(p) + 7 AS e
        |  FROM isl GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT doc_id, n_tokens, s, e - s + 1 AS span_tokens,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY e - s + 1 DESC, s ASC) AS rk
        |  FROM spans
        |), agg AS (
        |  SELECT doc_id, n_tokens, COUNT(*) AS n_spans,
        |    SUM(span_tokens) AS dup_tokens,
        |    MAX(CASE WHEN rk = 1 THEN s END) AS top_s,
        |    MAX(CASE WHEN rk = 1 THEN span_tokens END) AS top_len
        |  FROM ranked GROUP BY 1, 2
        |)
        |SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(a.n_spans AS BIGINT) AS n_spans,
        |  CAST(a.dup_tokens AS BIGINT) AS dup_tokens,
        |  CAST(a.dup_tokens AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
        |    AS dup_token_share,
        |  CAST(a.top_s AS BIGINT) AS top_span_start,
        |  CAST(a.top_len AS BIGINT) AS top_span_tokens,
        |  CAST(CASE WHEN a.top_s = 1 THEN 1
        |    ELSE length(array_to_string(t.w[1:CAST(a.top_s AS INT) - 1], ' ')) + 2
        |    END AS BIGINT) AS top_span_char_start
        |FROM agg a JOIN t USING (doc_id)""".stripMargin,

    // q258: byte-level ingest dedup probe — delta docs (md5 bucket >=
    // 95) CDC-chunked and probed against the distinct chunk fingerprints
    // of the standing corpus (bucket < 95); per-doc hit/byte rollup.
    "q258_cdc_ingest_probe" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS l,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, bucket, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT doc_id, bucket,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT doc_id, bucket, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), idx AS (
        |  SELECT DISTINCT fp FROM ch WHERE bucket < 95
        |)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hit,
        |  CAST(SUM(c.clen) AS BIGINT) AS n_chars,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN c.clen ELSE 0 END) AS BIGINT)
        |    AS dup_chars,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN c.clen ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c.clen) AS DOUBLE) AS dup_char_share
        |FROM ch c LEFT JOIN idx i ON c.fp = i.fp
        |WHERE c.bucket >= 95
        |GROUP BY 1""".stripMargin,

    // q259: exact-substring scrub — q257's shared spans cut from every
    // document (all occurrences), kept tokens re-joined by spaces;
    // untouched docs pass through with removed_tokens = 0.
    "q259_exact_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), dup AS (
        |  SELECT fp FROM pos GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)
        |), sp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (fp)
        |), isl AS (
        |  SELECT doc_id, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), cuts AS (
        |  SELECT doc_id, list({'s': s, 'e': e}) AS cs
        |  FROM (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
        |        FROM isl GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - len(kept) AS BIGINT) AS removed_tokens,
        |  -- DuckDB: array_to_string([]) is NULL; Spark concat_ws is ''
        |  COALESCE(array_to_string(kept, ' '), '') AS text_clean
        |FROM (
        |  SELECT t.doc_id, t.w,
        |    CASE WHEN c.cs IS NULL THEN t.w ELSE
        |      [t.w[i] FOR i IN range(1, len(t.w) + 1)
        |       IF len(list_filter(c.cs, x -> i >= x.s AND i <= x.e)) = 0]
        |    END AS kept
        |  FROM t LEFT JOIN cuts c USING (doc_id)
        |) t""".stripMargin,

    // q260: cross-source chunk-flow matrix — self-join of the
    // (source, fp) distinct CDC chunk relation on fp, source_a <
    // source_b; per pair the shared-fingerprint count and each side's
    // byte mass on those fingerprints.
    "q260_chunk_flow" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS l FROM documents
        |  WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, source, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT source,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT source, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), pf AS (
        |  SELECT source, fp, SUM(clen) AS chars FROM ch GROUP BY 1, 2
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_fp,
        |  CAST(SUM(a.chars) AS BIGINT) AS chars_a,
        |  CAST(SUM(b.chars) AS BIGINT) AS chars_b
        |FROM pf a JOIN pf b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // q261: exact-dup-adjusted token accounting — (md5(text), source)
    // cells, global copy counts joined back, 1/n attribution in integer
    // micro-units. Same words/md5 idioms as q73/q20.
    "q261_effective_tokens" ->
      """WITH t AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), per AS (
        |  SELECT h, source, n_tok, COUNT(*) AS cnt_s FROM t GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT h, SUM(cnt_s) AS n_total FROM per GROUP BY 1
        |)
        |SELECT p.source,
        |  CAST(SUM(p.cnt_s) AS BIGINT) AS raw_docs,
        |  CAST(SUM(p.n_tok * p.cnt_s) AS BIGINT) AS raw_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_texts,
        |  CAST(SUM((1000000 * p.n_tok * p.cnt_s) // t2.n_total) AS BIGINT)
        |    AS eff_tokens_micro
        |FROM per p JOIN tot t2 USING (h)
        |GROUP BY 1""".stripMargin,

    // q262: Cohen's kappa over the q245 confusion matrix — q245's CTEs
    // verbatim, then marginal products in HUGEINT and micro-unit floor
    // division (mirrors the Spark side's DECIMAL(38,0) internal).
    "q262_kappa_agreement" ->
      """WITH fold AS (
        |  SELECT doc_id, source, text,
        |    ( (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 2 AS b
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, source, b, unnest(string_split(text, ' ')) AS word
        |  FROM fold
        |), cw AS (
        |  SELECT source, word, COUNT(*) AS cnt FROM w
        |  WHERE b = 0 GROUP BY 1, 2
        |), voc AS (
        |  SELECT COUNT(DISTINCT word) AS v FROM cw
        |), classes AS (
        |  SELECT source AS cand, 1000000 * (SUM(cnt) + voc.v) AS unseen
        |  FROM cw CROSS JOIN voc GROUP BY 1, voc.v
        |), delta AS (
        |  SELECT cw.word, c.cand,
        |    c.unseen // (cw.cnt + 1) - c.unseen AS delta
        |  FROM cw JOIN classes c ON cw.source = c.cand
        |), tf AS (
        |  SELECT doc_id, source, word, COUNT(*) AS tf FROM w
        |  WHERE b = 1 GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT doc_id, source, SUM(tf) AS t FROM tf GROUP BY 1, 2
        |), adj AS (
        |  SELECT tf.doc_id, d.cand, SUM(tf.tf * d.delta) AS adj
        |  FROM tf JOIN delta d USING (word) GROUP BY 1, 2
        |), sc AS (
        |  SELECT tot.doc_id, tot.source, c.cand,
        |    tot.t * c.unseen + COALESCE(adj.adj, 0) AS score
        |  FROM tot CROSS JOIN classes c
        |  LEFT JOIN adj ON adj.doc_id = tot.doc_id AND adj.cand = c.cand
        |), pred AS (
        |  SELECT doc_id, source, cand AS predicted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score, cand) AS rn
        |  FROM sc
        |), cm AS (
        |  SELECT source, predicted, COUNT(*) AS n
        |  FROM pred WHERE rn = 1 GROUP BY 1, 2
        |), agg AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(CASE WHEN source = predicted THEN n ELSE 0 END) AS BIGINT)
        |      AS n_agree
        |  FROM cm
        |), ra AS (
        |  SELECT source, SUM(n) AS n_actual FROM cm GROUP BY 1
        |), rp AS (
        |  SELECT predicted, SUM(n) AS n_pred FROM cm GROUP BY 1
        |), ch AS (
        |  SELECT CAST(SUM(ra.n_actual * rp.n_pred) AS HUGEINT) AS chance_mass
        |  FROM ra JOIN rp ON ra.source = rp.predicted
        |), m AS (
        |  SELECT agg.n_total, agg.n_agree,
        |    (1000000 * agg.n_agree) // agg.n_total AS po_micro,
        |    CAST((1000000 * ch.chance_mass)
        |      // (CAST(agg.n_total AS HUGEINT) * agg.n_total) AS BIGINT)
        |      AS pe_micro
        |  FROM agg CROSS JOIN ch
        |)
        |SELECT n_total, n_agree, po_micro, pe_micro,
        |  (1000000 * (po_micro - pe_micro)) // (1000000 - pe_micro)
        |    AS kappa_micro
        |FROM m""".stripMargin,

    // q263: q73's shard/cum CTE verbatim, swept over four literal
    // budgets — straddle rule (cum-n)//B != (cum-1)//B, sequences =
    // Σ_shard ceil(shard_tokens/B), micro-unit ratios.
    "q263_pack_sweep" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 32 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t
        |), b AS (
        |  SELECT CAST(unnest([512, 1024, 2048, 4096]) AS BIGINT) AS budget
        |), perdoc AS (
        |  SELECT b.budget,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN c.n_tokens >= 1 AND
        |        (c.cum - c.n_tokens) // b.budget <> (c.cum - 1) // b.budget
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddled
        |  FROM c CROSS JOIN b GROUP BY 1
        |), sh AS (
        |  SELECT shard, MAX(cum) AS st FROM c GROUP BY 1
        |), seqs AS (
        |  SELECT b.budget,
        |    CAST(SUM(CASE WHEN sh.st >= 1 THEN (sh.st - 1) // b.budget + 1
        |      ELSE 0 END) AS BIGINT) AS n_seqs
        |  FROM sh CROSS JOIN b GROUP BY 1
        |)
        |SELECT p.budget, p.n_docs, p.total_tokens, p.n_straddled, s.n_seqs,
        |  (1000000 * p.n_straddled) // p.n_docs AS straddle_micro,
        |  (1000000 * p.total_tokens) // (s.n_seqs * p.budget) AS util_micro
        |FROM perdoc p JOIN seqs s USING (budget)""".stripMargin,

    // q264: cluster-atomic split — the q40 lottery applied to md5(text)
    // (salted "csplit|"), so dup copies share a split by construction.
    "q264_cluster_split" ->
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS cluster_key,
        |    ( (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 4, 1)) - 1) ) % 100 AS b
        |  FROM documents
        |)
        |SELECT doc_id, cluster_key,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM t""".stripMargin,

    // q265: Kneser–Ney bigram fluency — D = 3/4 exactly on a common
    // denominator, one HUGEINT floor division per bigram (mirrors
    // Spark's DECIMAL(38,0) div), q236's VARCHAR→DOUBLE sum parity.
    "q265_kn_fluency" ->
      """WITH bg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS c12,
        |    string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
        |  FROM bg GROUP BY 1
        |), h AS (
        |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS nc1 FROM b2 GROUP BY 1
        |), hist AS (
        |  SELECT w2, COUNT(*) AS nh2 FROM b2 GROUP BY 1
        |), bt AS (
        |  SELECT COUNT(*) AS b FROM b2
        |), sc AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    SUM((4000000::HUGEINT * h.c1 * bt.b) //
        |        (CAST(greatest(4 * b2.c12 - 3, 0) AS HUGEINT) * bt.b
        |         + 3::HUGEINT * h.nc1 * hist.nh2)) AS s
        |  FROM bg JOIN b2 USING (bigram) JOIN h USING (w1)
        |    JOIN hist USING (w2) CROSS JOIN bt
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_kn
        |FROM sc""".stripMargin,

    // q266: token-balanced shard manifest — global token-desc rank,
    // snake-striped across 8 shards; rank via row_number here, via
    // bucketedPrefix in Spark (order-identical by the doc_id tiebreak).
    "q266_shard_manifest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tok,
        |    CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rank
        |  FROM t
        |)
        |SELECT doc_id, n_tok, rank,
        |  CAST(CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
        |       ELSE 7 - (rank - 1) % 8 END AS BIGINT) AS shard
        |FROM r""".stripMargin,

    // q267: q194's allocation CTE chain verbatim, then the epoch-plan
    // arithmetic — every added column HUGEINT (mirrors DECIMAL(38,0)).
    "q267_epoch_plan" ->
      """WITH t AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM t
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |), p AS (
        |  SELECT source, n_tokens,
        |    base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens
        |  FROM r
        |), e AS (
        |  SELECT *, (1000000::HUGEINT * alloc_tokens) // n_tokens AS epochs_micro
        |  FROM p
        |)
        |SELECT source, n_tokens, alloc_tokens,
        |  CAST(epochs_micro AS BIGINT) AS epochs_micro,
        |  epochs_micro > 4000000 AS capped,
        |  CAST(greatest(alloc_tokens - 4 * n_tokens, 0) AS BIGINT) AS wasted_tokens,
        |  CAST((4::HUGEINT * n_tokens * epochs_micro)
        |       // (epochs_micro + 4000000) AS BIGINT) AS effective_tokens
        |FROM e""".stripMargin,

    // q268: Neyman allocation — q246's score CTEs, per-source HUGEINT
    // moments, exact integer sqrt (double seed + two ±1 clamp probes
    // each way), then the q194 largest-remainder seat assignment. The
    // radicand reaches the double via VARCHAR (correct rounding past
    // 2^53, the q236 parity rule).
    "q268_neyman_alloc" ->
      """WITH g0 AS (
        |  SELECT doc_id, source,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, source, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT source, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), mo AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    SUM(CAST(s AS HUGEINT)) AS s1,
        |    SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS s2
        |  FROM sc GROUP BY 1
        |), mm AS (
        |  SELECT source, n_docs,
        |    CAST(n_docs AS HUGEINT) * s2 - s1 * s1 AS m FROM mo
        |), q0 AS (
        |  SELECT *, CAST(floor(sqrt(CAST(CAST(m AS VARCHAR) AS DOUBLE)))
        |    AS HUGEINT) AS r0 FROM mm
        |), q1 AS (
        |  SELECT *, CASE WHEN (r0+1)*(r0+1) <= m THEN r0+1 ELSE r0 END AS r1 FROM q0
        |), q2 AS (
        |  SELECT *, CASE WHEN (r1+1)*(r1+1) <= m THEN r1+1 ELSE r1 END AS r2 FROM q1
        |), q3 AS (
        |  SELECT *, CASE WHEN r2*r2 > m THEN r2-1 ELSE r2 END AS r3 FROM q2
        |), qw AS (
        |  SELECT source, n_docs,
        |    CASE WHEN r3*r3 > m THEN r3-1 ELSE r3 END AS w FROM q3
        |), a AS (
        |  SELECT *, (1000::HUGEINT * w) // (SELECT SUM(w) FROM qw) AS base,
        |            (1000::HUGEINT * w) % (SELECT SUM(w) FROM qw) AS rem
        |  FROM qw
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT source, n_docs, CAST(w AS BIGINT) AS ns_sd,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_docs
        |FROM r""".stripMargin,

    // q269: exact-token blocklist screen — per-occurrence hit counts via
    // list_filter, distinct terms via list_intersect (both engines
    // dedupe intersections; only sizes are compared).
    "q269_blocklist_screen" ->
      """WITH t AS (
        |  SELECT doc_id, source, w,
        |    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bg
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |), h AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(w, x -> list_contains(['slow','merge','spill'], x)))
        |       + len(list_filter(bg, x -> list_contains(['hash value','table scan'], x)))
        |      AS BIGINT) AS n_hits,
        |    CAST(len(list_intersect(w, ['slow','merge','spill']))
        |       + len(list_intersect(bg, ['hash value','table scan']))
        |      AS BIGINT) AS n_terms
        |  FROM t
        |)
        |SELECT doc_id, source, n_hits, n_terms, n_hits > 0 AS flagged
        |FROM h""".stripMargin,

    // q270: CSLS/ratio-margin pairs — q250's LSH+fixed-point-cosine
    // chain, cosines floored to the 1e6 grid, μk kept as an unreduced
    // (sum, count), one positive HUGEINT division on the common
    // denominator (mirrors Spark's DECIMAL(38,0) div exactly).
    "q270_margin_pairs" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE))) AS cosine
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), cosm AS (
        |  SELECT vec_a, vec_b, CAST(floor(cosine * 1e6) AS BIGINT) AS cos_micro FROM cos
        |), directed AS (
        |  SELECT vec_a AS src, vec_b AS nbr, cos_micro FROM cosm
        |  UNION ALL
        |  SELECT vec_b, vec_a, cos_micro FROM cosm
        |), topk AS (
        |  SELECT src, SUM(cos_micro) AS msum, COUNT(*) AS mn FROM (
        |    SELECT src, cos_micro,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY cos_micro DESC, nbr ASC) AS rn
        |    FROM directed)
        |  WHERE rn <= 3 GROUP BY src
        |), scored AS (
        |  SELECT c.vec_a, c.vec_b, c.cos_micro,
        |    CAST((2000000::HUGEINT * c.cos_micro * a.mn * b.mn)
        |      // (CAST(a.msum AS HUGEINT) * b.mn + CAST(b.msum AS HUGEINT) * a.mn)
        |      AS BIGINT) AS margin_micro
        |  FROM cosm c
        |  JOIN topk a ON a.src = c.vec_a
        |  JOIN topk b ON b.src = c.vec_b
        |  WHERE c.cos_micro > 0
        |    AND CAST(a.msum AS HUGEINT) * b.mn + CAST(b.msum AS HUGEINT) * a.mn > 0
        |)
        |SELECT vec_a, vec_b, cos_micro, margin_micro
        |FROM scored WHERE margin_micro >= 1020000""".stripMargin,

    // q271: centroid-distance outliers — common-denominator squared
    // distance in HUGEINT (mirrors DECIMAL(38,0)), per-label rank via
    // row_number (Spark recovers it from the bucketedPrefix global
    // rank), one VARCHAR-routed double division for the reported d2.
    "q271_centroid_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label, i AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS x
        |  FROM embeddings,
        |  LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
        |), s AS (
        |  SELECT label, pos, SUM(x) AS s FROM q GROUP BY 1, 2
        |), n AS (
        |  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
        |), d AS (
        |  SELECT q.vec_id, q.label,
        |    SUM((CAST(q.x AS HUGEINT) * n.n - s.s)
        |      * (CAST(q.x AS HUGEINT) * n.n - s.s)) AS d2num,
        |    MAX(n.n) AS n
        |  FROM q JOIN s USING (label, pos) JOIN n USING (label)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT vec_id, label,
        |    CAST(CAST(d2num AS VARCHAR) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * 1e16) AS d2,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY d2num DESC, vec_id) AS BIGINT) AS rank,
        |    n
        |  FROM d
        |)
        |SELECT vec_id, label, d2, rank,
        |  rank <= (n * 1 + 99) // 100 AS flagged
        |FROM r""".stripMargin,

    // q272: composed admission gate — four row-local rules, reasons as
    // the sorted comma-joined tag list (list comprehension drops the
    // non-firing NULL tags), q54's regexes for the pii rule.
    "q272_admission_audit" ->
      """WITH t AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w
        |  FROM documents
        |), b AS (
        |  SELECT *, [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bg
        |  FROM t
        |), v AS (
        |  SELECT doc_id, source,
        |    -- DuckDB's array_to_string([]) is NULL; Spark's concat_ws is ''
        |    coalesce(array_to_string(list_sort([r FOR r IN [
        |      CASE WHEN len(w) < 5 THEN 'too_short' END,
        |      CASE WHEN len(list_filter(w, x -> list_contains(['slow','merge','spill'], x)))
        |             + len(list_filter(bg, x -> list_contains(['hash value','table scan'], x))) > 0
        |           THEN 'blocklist' END,
        |      CASE WHEN len(bg) > 0 AND (len(bg) - len(list_distinct(bg))) * 2 > len(bg)
        |           THEN 'repetition' END,
        |      CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |             + len(regexp_extract_all(text, '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) > 0
        |           THEN 'pii' END
        |    ] IF r IS NOT NULL]), ','), '') AS reasons
        |  FROM b
        |)
        |SELECT doc_id, source, reasons, reasons = '' AS admitted
        |FROM v""".stripMargin,

    // q273: Spearman-with-ties between the dup-share and inverse-fluency
    // scores per source — exact doubled midranks (min+max row_number over
    // each tie group), HUGEINT moments, the q268 isqrt clamp, and one
    // positive integer division onto the 1e6 grid.
    "q273_signal_agreement" ->
      """WITH bgr AS (
        |  SELECT doc_id, source, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 2
        |  )
        |), sa AS (
        |  SELECT doc_id, source, (1000000 * dup_mass) // n_grams AS s_dup
        |  FROM (
        |    SELECT doc_id, source, SUM(n) AS n_grams,
        |      SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |    FROM (SELECT doc_id, source, bigram, COUNT(*) AS n
        |          FROM bgr GROUP BY 1, 2, 3)
        |    GROUP BY 1, 2)
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS n12 FROM bgr GROUP BY 1
        |), h1 AS (
        |  SELECT w1, COUNT(*) AS n1 FROM bgr GROUP BY 1
        |), voc AS (SELECT COUNT(*) AS v FROM h1
        |), sb AS (
        |  SELECT doc_id, s // nb AS s_flu FROM (
        |    SELECT bgr.doc_id, COUNT(*) AS nb,
        |      SUM((1000000 * (h1.n1 + voc.v)) // (b2.n12 + 1)) AS s
        |    FROM bgr JOIN b2 USING (bigram) JOIN h1 USING (w1) CROSS JOIN voc
        |    GROUP BY 1)
        |), sc AS (
        |  SELECT sa.doc_id, sa.source, sa.s_dup, sb.s_flu
        |  FROM sa JOIN sb USING (doc_id)
        |), ra AS (
        |  SELECT doc_id, source, s_dup,
        |    row_number() OVER (PARTITION BY source ORDER BY s_dup, doc_id) AS rk
        |  FROM sc
        |), ma AS (
        |  SELECT source, s_dup, MIN(rk) + MAX(rk) AS a2 FROM ra GROUP BY 1, 2
        |), rb AS (
        |  SELECT doc_id, source, s_flu,
        |    row_number() OVER (PARTITION BY source ORDER BY s_flu, doc_id) AS rk
        |  FROM sc
        |), mb AS (
        |  SELECT source, s_flu, MIN(rk) + MAX(rk) AS b2 FROM rb GROUP BY 1, 2
        |), mr AS (
        |  SELECT sc.doc_id, sc.source, ma.a2, mb.b2
        |  FROM sc JOIN ma ON ma.source = sc.source AND ma.s_dup = sc.s_dup
        |          JOIN mb ON mb.source = sc.source AND mb.s_flu = sc.s_flu
        |), mo AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(a2::HUGEINT) AS sa1, SUM(b2::HUGEINT) AS sb1,
        |    SUM(a2::HUGEINT * b2) AS sab,
        |    SUM(a2::HUGEINT * a2) AS saa,
        |    SUM(b2::HUGEINT * b2) AS sbb
        |  FROM mr GROUP BY 1
        |), vv AS (
        |  SELECT source, n,
        |    n::HUGEINT * sab - sa1 * sb1 AS covn,
        |    n::HUGEINT * saa - sa1 * sa1 AS vara,
        |    n::HUGEINT * sbb - sb1 * sb1 AS varb
        |  FROM mo
        |), q0 AS (
        |  SELECT *,
        |    CAST(floor(sqrt(CAST(CAST(vara AS VARCHAR) AS DOUBLE))) AS HUGEINT) AS ra0,
        |    CAST(floor(sqrt(CAST(CAST(varb AS VARCHAR) AS DOUBLE))) AS HUGEINT) AS rb0
        |  FROM vv
        |), q1 AS (
        |  SELECT *, CASE WHEN (ra0+1)*(ra0+1) <= vara THEN ra0+1 ELSE ra0 END AS ra1,
        |            CASE WHEN (rb0+1)*(rb0+1) <= varb THEN rb0+1 ELSE rb0 END AS rb1 FROM q0
        |), q2 AS (
        |  SELECT *, CASE WHEN (ra1+1)*(ra1+1) <= vara THEN ra1+1 ELSE ra1 END AS ra2,
        |            CASE WHEN (rb1+1)*(rb1+1) <= varb THEN rb1+1 ELSE rb1 END AS rb2 FROM q1
        |), q3 AS (
        |  SELECT *, CASE WHEN ra2*ra2 > vara THEN ra2-1 ELSE ra2 END AS ra3,
        |            CASE WHEN rb2*rb2 > varb THEN rb2-1 ELSE rb2 END AS rb3 FROM q2
        |), qr AS (
        |  SELECT source, n, covn,
        |    CASE WHEN ra3*ra3 > vara THEN ra3-1 ELSE ra3 END AS rra,
        |    CASE WHEN rb3*rb3 > varb THEN rb3-1 ELSE rb3 END AS rrb
        |  FROM q3
        |)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  CASE WHEN (rra * rrb) // 1000000 > 0 THEN
        |    CAST(CASE WHEN covn >= 0
        |      THEN abs(covn) // ((rra * rrb) // 1000000)
        |      ELSE -(abs(covn) // ((rra * rrb) // 1000000)) END AS BIGINT)
        |  ELSE NULL END AS rho_micro
        |FROM qr""".stripMargin,

    // q274: token-precision ingest probe — delta docs (q258's md5 bucket
    // >= 95) probed against the corpus window-fp index; md5 windows here
    // vs the KR rolling kernel in Spark (independent families, same hit
    // set); longest hit run via gaps-and-islands over hit windows.
    "q274_substring_probe" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8
        |), pos AS (
        |  SELECT doc_id, bucket, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, bucket, w, unnest(range(1, len(w) - 6)) AS i FROM t)
        |), corp AS (
        |  SELECT DISTINCT fp FROM pos WHERE bucket < 95
        |), probed AS (
        |  SELECT d.doc_id, d.p, (c.fp IS NOT NULL) AS hit
        |  FROM (SELECT * FROM pos WHERE bucket >= 95) d
        |  LEFT JOIN corp c USING (fp)
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_windows,
        |    SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit
        |  FROM probed GROUP BY 1
        |), runs AS (
        |  SELECT doc_id, MAX(run) AS top_run FROM (
        |    SELECT doc_id, isl, COUNT(*) AS run FROM (
        |      SELECT doc_id, p,
        |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        |      FROM probed WHERE hit)
        |    GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(t.n_windows AS BIGINT) AS n_windows,
        |  CAST(t.n_hit AS BIGINT) AS n_hit,
        |  CAST(t.n_hit AS DOUBLE) / CAST(t.n_windows AS DOUBLE) AS hit_share,
        |  CAST(coalesce(r.top_run, 0) AS BIGINT) AS top_run_windows,
        |  CAST(CASE WHEN coalesce(r.top_run, 0) > 0
        |       THEN coalesce(r.top_run, 0) + 7 ELSE 0 END AS BIGINT)
        |    AS top_run_tokens
        |FROM tot t LEFT JOIN runs r USING (doc_id)""".stripMargin,

    // q275: hard negatives — the q250 LSH + fixed-point-cosine chain,
    // band-filtered on the 1e6 grid, per-anchor top-3 by row_number.
    "q275_hard_negatives" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(floor(1e6 *
        |      CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)))) AS BIGINT) AS cos_micro
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), band AS (
        |  SELECT * FROM cos WHERE cos_micro >= 300000 AND cos_micro < 900000
        |), directed AS (
        |  SELECT vec_a AS anchor, vec_b AS negative, cos_micro FROM band
        |  UNION ALL
        |  SELECT vec_b, vec_a, cos_micro FROM band
        |)
        |SELECT anchor, negative, cos_micro, CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT anchor, negative, cos_micro,
        |    row_number() OVER (PARTITION BY anchor
        |      ORDER BY cos_micro DESC, negative ASC) AS rank
        |  FROM directed)
        |WHERE rank <= 3""".stripMargin,

    // q276: the erase audit recomputed from the RAW orders relation —
    // the Spark side reads the physically-rewritten target table, so a
    // lost row, leaked victim, or clobbered untouched partition all
    // hash-mismatch here. Victims: five smallest distinct custkeys with
    // md5 bucket < 10 (the q258 bucket rule on custkey).
    "q276_gdpr_erase" ->
      """WITH b AS (
        |  SELECT o_custkey,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 4, 1)) - 1) ) % 100 AS cust_bucket
        |  FROM orders
        |), v AS (
        |  SELECT o_custkey FROM (SELECT DISTINCT o_custkey, cust_bucket FROM b)
        |  WHERE cust_bucket < 10 ORDER BY o_custkey LIMIT 5
        |), vb AS (
        |  SELECT DISTINCT cust_bucket FROM b WHERE o_custkey IN (SELECT o_custkey FROM v)
        |), agg AS (
        |  SELECT cust_bucket, COUNT(*) AS rows_before,
        |    SUM(CASE WHEN o_custkey IN (SELECT o_custkey FROM v) THEN 1 ELSE 0 END) AS erased
        |  FROM b GROUP BY 1
        |)
        |SELECT cust_bucket, CAST(rows_before AS BIGINT) AS rows_before,
        |  CAST(rows_before - erased AS BIGINT) AS rows_after,
        |  CAST(erased AS BIGINT) AS erased,
        |  cust_bucket IN (SELECT cust_bucket FROM vb) AS rewritten,
        |  CAST(0 AS BIGINT) AS residual_victims
        |FROM agg""".stripMargin,

    // q277: image perceptual-hash near-dup. The Spark side synthesizes
    // real PNGs (docs ≡ 3 mod 17 carry a +6-brightness mod-256 re-encode
    // of doc_id-1's image), decodes them, and dHashes the decoded
    // pixels; the oracle rebuilds the SAME hashes from the closed-form
    // pixel function (PNG is lossless), then replays the 4×16-bit
    // Hamming-band LSH and the bit_count verify. A hash match therefore
    // proves the whole codec→hash→band→verify chain.
    "q277_image_dhash_dups" ->
      q277OracleSql,

    // q278: audio perceptual-fingerprint near-dup — q277's pipeline over
    // the WAV side. The Spark kernel decodes real RIFF/WAVE PCM (docs
    // ≡ 5 mod 19 carry a 63/64-gain re-encode of doc_id-1's audio) and
    // fingerprints 65 frame-mean-|amplitude|s by sign of delta; the
    // oracle rebuilds the samples closed-form (WAV PCM is lossless) and
    // replays frames → bits → bands → bounded window → bit_count.
    "q278_audio_fp_dups" ->
      q278OracleSql,

    // q279: GIF scene-cut detection. Spark decodes real multi-frame GIF
    // bytes and fingerprints each frame (63-bit raster sign-of-delta);
    // the oracle rebuilds the frames closed-form (indexed gray is
    // lossless) and replays lag/threshold/scene numbering. Scene changes
    // rotate the gradient direction; within-scene drift is additive and
    // must NOT cut.
    "q279_scene_cuts" ->
      """WITH dims AS (
        |  SELECT doc_id, 2 + doc_id % 7 AS n FROM documents
        |), px AS (
        |  SELECT d.doc_id, f.f AS f, y.y * 8 + x.x AS i,
        |    (x.x * (31 + 37 * (f.f // 3)) + y.y * (17 + 53 * (f.f // 3))
        |     + d.doc_id + f.f * 3) % 256 AS g
        |  FROM dims d, range(0, 8) f(f), range(0, 8) x(x), range(0, 8) y(y)
        |  WHERE f.f < d.n
        |), bits AS (
        |  SELECT a.doc_id, a.f, a.i AS pos
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.f = a.f AND b.i = a.i + 1
        |  WHERE a.i <= 62 AND b.g > a.g
        |), fps AS (
        |  SELECT d.doc_id, fr.f AS frame,
        |    COALESCE(CAST(s.h AS BIGINT), 0) AS fp
        |  FROM dims d
        |  JOIN range(0, 8) fr(f) ON fr.f < d.n
        |  LEFT JOIN (SELECT doc_id, f, SUM(CAST(1 AS BIGINT) << pos) AS h
        |             FROM bits GROUP BY 1, 2) s
        |    ON s.doc_id = d.doc_id AND s.f = fr.f
        |), marked AS (
        |  SELECT doc_id, frame,
        |    CASE WHEN LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame) IS NULL
        |         THEN -1
        |         ELSE bit_count(xor(fp, LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame))) END
        |      AS hamming_prev
        |  FROM fps
        |)
        |SELECT doc_id, CAST(frame AS INT) AS frame,
        |  CAST(hamming_prev AS INT) AS hamming_prev,
        |  (hamming_prev = -1 OR hamming_prev > 8) AS new_scene,
        |  CAST(SUM(CASE WHEN hamming_prev = -1 OR hamming_prev > 8 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY frame) AS BIGINT) AS scene_id
        |FROM marked""".stripMargin,

    // q280: multimodal dup-evidence fusion — the q277, q278, and q281
    // verdict chains composed verbatim as CTEs (the oracle literally
    // reuses the three independently-gated queries) and FULL OUTER
    // joined on the pair key; absent verdicts surface as -1 so the
    // table hash-compares.
    "q280_dup_evidence" ->
      s"""WITH img AS (
         |$q277OracleSql
         |), aud AS (
         |$q278OracleSql
         |), vid AS (
         |$q281OracleSql
         |), ia AS (
         |SELECT COALESCE(i.doc_a, a.doc_a) AS doc_a,
         |  COALESCE(i.doc_b, a.doc_b) AS doc_b,
         |  i.hamming AS ih, a.hamming AS ah
         |FROM img i FULL OUTER JOIN aud a
         |  ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
         |)
         |SELECT COALESCE(x.doc_a, v.doc_a) AS doc_a,
         |  COALESCE(x.doc_b, v.doc_b) AS doc_b,
         |  CAST(COALESCE(x.ih, -1) AS INT) AS img_hamming,
         |  CAST(COALESCE(x.ah, -1) AS INT) AS aud_hamming,
         |  CAST(COALESCE(v.matched, -1) AS INT) AS vid_matched,
         |  CAST((CASE WHEN x.ih IS NULL THEN 0 ELSE 1 END)
         |     + (CASE WHEN x.ah IS NULL THEN 0 ELSE 1 END)
         |     + (CASE WHEN v.doc_a IS NULL THEN 0 ELSE 1 END) AS INT)
         |    AS n_modalities
         |FROM ia x FULL OUTER JOIN vid v
         |  ON x.doc_a = v.doc_a AND x.doc_b = v.doc_b""".stripMargin,

    // q281: clip-level video near-dup. Spark decodes real multi-frame
    // GIF bytes (the planted twins are TRIMMED + brightness-ridden
    // re-encodes of their neighbour's actual bytes), extracts scene
    // keyframes partition-locally, and band-joins + set-overlap
    // verifies; the oracle rebuilds every frame from the closed-form
    // pixel hash (indexed gray is lossless) and replays the identical
    // cut rule, banding, bounded window, and overlap verdict.
    "q281_clip_dups" ->
      q281OracleSql,

    // q282: k-anonymity / l-diversity audit over a 3-level
    // generalization ladder — bands on IEEE floor(bal/width), classes
    // by (width, nation, band), one report row per width.
    "q282_k_anonymity" ->
      """WITH lad AS (
        |  SELECT c_nationkey, c_acctbal, c_mktsegment, w.band_width
        |  FROM customer, (SELECT UNNEST([100, 1000, 10000]) AS band_width) w
        |), cls AS (
        |  SELECT band_width, c_nationkey,
        |    CAST(floor(c_acctbal / band_width) AS BIGINT) AS band,
        |    COUNT(*) AS k, COUNT(DISTINCT c_mktsegment) AS l
        |  FROM lad GROUP BY 1, 2, 3
        |)
        |SELECT CAST(band_width AS BIGINT) AS band_width,
        |  COUNT(*) AS n_classes,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS records_at_risk,
        |  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_at_risk,
        |  MIN(l) AS min_l,
        |  CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS classes_l1
        |FROM cls GROUP BY 1""".stripMargin,

    // q283: fixed-point PageRank (3 supersteps, damping 0.85) over the
    // q121 support-2 co-purchase edge relation, symmetrized; all
    // arithmetic on the integer ppb grid (contrib = r // outdeg,
    // r' = 0.15e9 + (85 * inflow) // 100) so both engines agree bit-for-bit.
    "q283_pagerank" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |freq AS (SELECT p FROM baskets GROUP BY 1 HAVING COUNT(*) >= 2),
        |fb AS (SELECT o, p FROM baskets WHERE p IN (SELECT p FROM freq)),
        |ed AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |),
        |sym AS (SELECT a AS src, b AS dst FROM ed
        |        UNION ALL SELECT b AS src, a AS dst FROM ed),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST(1000000000 AS HUGEINT) AS r FROM deg),
        |i1 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN r0 r ON r.node = s.src
        |  GROUP BY 1
        |),
        |i2 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN i1 r ON r.node = s.src
        |  GROUP BY 1
        |),
        |i3 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN i2 r ON r.node = s.src
        |  GROUP BY 1
        |)
        |SELECT i3.node AS part, d.outdeg, CAST(i3.r AS BIGINT) AS rank_ppb
        |FROM i3 JOIN deg d ON d.src = i3.node""".stripMargin,

    // q284: audio VAD segmentation. Spark decodes a real RIFF/WAVE
    // round trip and segments voiced runs inside the kernel; the oracle
    // replays the closed-form per-sample waveform (16-bit PCM is
    // lossless), the integer window energies, and the gaps-and-islands
    // run decomposition.
    "q284_audio_vad" ->
      """WITH d AS (
        |  SELECT doc_id, 512 + doc_id % 512 AS n,
        |    (doc_id * 25173) % 65536 AS p1, (doc_id * 12289) % 65536 AS p2
        |  FROM documents
        |), smp AS (
        |  SELECT d.doc_id, t.t // 64 AS w,
        |    abs(CASE WHEN (d.doc_id * 31 + (t.t // 64) * 17) % 5 >= 2
        |      THEN ((d.p1 + t.t * 13849) % 65536
        |            + (d.p2 + t.t * 31397) % 65536) % 65536 - 32768
        |      ELSE (d.p1 + t.t * 13849) % 128 - 64 END) AS av
        |  FROM d, range(0, 1024) t(t) WHERE t.t < d.n
        |), wins AS (
        |  SELECT doc_id, w, (SUM(av) // COUNT(*) >= 4096) AS on_w
        |  FROM smp GROUP BY 1, 2
        |), isl AS (
        |  SELECT doc_id, w,
        |    w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        |  FROM wins WHERE on_w
        |), segs AS (
        |  SELECT doc_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2
        |), perdoc AS (
        |  SELECT doc_id, COUNT(*) AS n_windows,
        |    SUM(CASE WHEN on_w THEN 1 ELSE 0 END) AS voiced_windows
        |  FROM wins GROUP BY 1
        |)
        |SELECT p.doc_id,
        |  CAST(p.n_windows AS BIGINT) AS n_windows,
        |  CAST(p.voiced_windows AS BIGINT) AS voiced_windows,
        |  CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
        |  CAST(COALESCE(s.longest_voiced, 0) AS BIGINT) AS longest_voiced,
        |  CAST((1000000 * p.voiced_windows) // p.n_windows AS BIGINT)
        |    AS voiced_ratio_micro
        |FROM perdoc p LEFT JOIN (
        |  SELECT doc_id, COUNT(*) AS n_segments, MAX(len) AS longest_voiced
        |  FROM segs GROUP BY 1) s ON s.doc_id = p.doc_id""".stripMargin,

    // q285: token-budget greedy selection — micro-grid type-token-ratio
    // density, total order (density desc, doc_id), inclusive running
    // token mass <= budget; one global cumulative window stands in for
    // the distributed bucketed prefix.
    "q285_budget_select" ->
      """WITH sc AS (
        |  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
        |    (1000000 * CAST(len(list_distinct(w)) AS BIGINT)) // len(w)
        |      AS density
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |), r AS (
        |  SELECT *, SUM(n_tok) OVER (ORDER BY density DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM sc
        |)
        |SELECT source, COUNT(*) AS n_admitted,
        |  CAST(SUM(n_tok) AS BIGINT) AS tokens_admitted,
        |  CAST(MIN(density) AS BIGINT) AS worst_density_admitted
        |FROM r WHERE cum <= 20000 GROUP BY 1""".stripMargin,

    // q286: dedup-adjusted mixture — q56's cluster membership, q195's
    // representative election, then q194's exact largest-remainder
    // allocation recomputed on the surviving mass.
    "q286_dedup_mixture" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), mem AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |  FROM reach GROUP BY src
        |), reps AS (
        |  SELECT doc_id FROM (
        |    SELECT m.doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY m.cluster
        |        ORDER BY dd.n_chars DESC, m.doc_id) AS rn
        |    FROM mem m JOIN documents dd ON dd.doc_id = m.doc_id)
        |  WHERE rn = 1
        |), surv AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM mem)
        |  UNION ALL
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM reps)
        |), kt AS (
        |  SELECT source, COUNT(*) AS n_docs_kept,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_kept
        |  FROM surv GROUP BY 1
        |), raw AS (
        |  SELECT source, COUNT(*) AS n_docs_raw,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_raw
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens_kept AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM kt
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT r.source, raw.n_docs_raw, raw.n_tokens_raw,
        |  r.n_docs_kept, r.n_tokens_kept,
        |  base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens,
        |  (1000000 * (raw.n_tokens_raw - r.n_tokens_kept)) // raw.n_tokens_raw
        |    AS dup_token_share_micro
        |FROM r JOIN raw ON raw.source = r.source""".stripMargin,

    // q287: balanced-target mixture by exact integer water-filling —
    // capped prefix on the (avail, lang)-sorted relation, level = R // m
    // with the remainder to the lexicographically first uncapped langs.
    "q287_target_mixture" ->
      """WITH av AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY 1
        |), rkd AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY avail_tokens, lang) AS rk,
        |    SUM(avail_tokens) OVER (ORDER BY avail_tokens, lang
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    (SELECT COUNT(*) FROM av) AS n_langs,
        |    (SELECT SUM(avail_tokens) FROM av) AS total_avail
        |  FROM av
        |), cpd AS (
        |  SELECT *, LEAST(500000, total_avail) AS bp,
        |    (avail_tokens * (n_langs - rk) + cum
        |      <= LEAST(500000, total_avail)) AS capped
        |  FROM rkd
        |), k AS (
        |  SELECT COALESCE(SUM(CASE WHEN capped THEN 1 ELSE 0 END), 0) AS n_capped,
        |    COALESCE(SUM(CASE WHEN capped THEN avail_tokens END), 0) AS capped_mass
        |  FROM cpd
        |), fin AS (
        |  SELECT c.lang, c.n_docs, c.avail_tokens, c.capped,
        |    CASE WHEN c.n_langs - k.n_capped > 0
        |         THEN (c.bp - k.capped_mass) // (c.n_langs - k.n_capped)
        |         ELSE 0 END AS lvl,
        |    CASE WHEN c.n_langs - k.n_capped > 0
        |         THEN (c.bp - k.capped_mass) % (c.n_langs - k.n_capped)
        |         ELSE 0 END AS rem,
        |    ROW_NUMBER() OVER (PARTITION BY c.capped ORDER BY c.lang) AS urk
        |  FROM cpd c, k
        |), al AS (
        |  SELECT lang, n_docs, avail_tokens, capped,
        |    CAST(CASE WHEN capped THEN avail_tokens
        |         ELSE lvl + CASE WHEN urk <= rem THEN 1 ELSE 0 END END
        |      AS BIGINT) AS alloc_tokens
        |  FROM fin
        |)
        |SELECT lang, n_docs, avail_tokens, alloc_tokens, capped,
        |  CAST((1000000 * alloc_tokens) // avail_tokens AS BIGINT)
        |    AS utilization_micro
        |FROM al""".stripMargin,

    // q288: diversity-first selection — q214's md5 hyperplane cells,
    // within-cell vec_id rank, first K of the (round, cell) total order;
    // one global cumulative window stands in for bucketedPrefix.
    "q288_diverse_select" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 6) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), rnk AS (
        |  SELECT vec_id, bucket,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS r
        |  FROM sig
        |), gl AS (
        |  SELECT s.bucket, s.r, e.label,
        |    ROW_NUMBER() OVER (ORDER BY s.r, s.bucket) AS grank
        |  FROM rnk s JOIN embeddings e ON e.vec_id = s.vec_id
        |)
        |SELECT label, COUNT(*) AS n_selected,
        |  CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_cells,
        |  CAST(MAX(r) AS INT) AS max_round
        |FROM gl WHERE grank <= 300 GROUP BY 1""".stripMargin,

    // q289: q259's scrub with the reference set = the eval tier
    // (doc_id % 10 = 3); train docs only in the output. The oracle keeps
    // per-window md5 as the independent fingerprint family.
    "q289_decontam_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), ev AS (
        |  SELECT DISTINCT fp FROM pos WHERE doc_id % 10 = 3
        |), sp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN ev USING (fp)
        |  WHERE pos.doc_id % 10 <> 3
        |), isl AS (
        |  SELECT doc_id, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), cuts AS (
        |  SELECT doc_id, list({'s': s, 'e': e}) AS cs
        |  FROM (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
        |        FROM isl GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - len(kept) AS BIGINT) AS removed_tokens,
        |  COALESCE(array_to_string(kept, ' '), '') AS text_clean
        |FROM (
        |  SELECT t.doc_id, t.w,
        |    CASE WHEN c.cs IS NULL THEN t.w ELSE
        |      [t.w[i] FOR i IN range(1, len(t.w) + 1)
        |       IF len(list_filter(c.cs, x -> i >= x.s AND i <= x.e)) = 0]
        |    END AS kept
        |  FROM t LEFT JOIN cuts c USING (doc_id)
        |  WHERE t.doc_id % 10 <> 3
        |) t""".stripMargin,

    // q290: PAV isotonic fit in the closed minimax form over the
    // bounded density-bin relation; floored micro means commute with
    // min/max, so both engines land on floor(true PAV) exactly.
    "q290_isotonic_rate" ->
      """WITH sc AS (
        |  SELECT md5(text) AS fp,
        |    ((1000000 * CAST(len(list_distinct(w)) AS BIGINT)) // len(w))
        |      // 50000 AS bin
        |  FROM (SELECT text, string_split(text, ' ') AS w FROM documents)
        |), dupfp AS (
        |  SELECT fp, 1 AS is_dup FROM sc GROUP BY fp HAVING COUNT(*) > 1
        |), br AS (
        |  SELECT bin, COUNT(*) AS n_docs,
        |    CAST(SUM(COALESCE(d.is_dup, 0)) AS BIGINT) AS n_dups
        |  FROM sc LEFT JOIN dupfp d USING (fp) GROUP BY 1
        |), cum AS (
        |  SELECT *,
        |    SUM(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cd,
        |    SUM(n_dups) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cy
        |  FROM br
        |), pairs AS (
        |  SELECT j.bin AS j, k.bin AS k,
        |    (1000000 * (k.cy - j.cy + j.n_dups))
        |      // (k.cd - j.cd + j.n_docs) AS mean_micro
        |  FROM cum j JOIN cum k ON j.bin <= k.bin
        |), mns AS (
        |  SELECT b.bin, p.j, MIN(p.mean_micro) AS mn
        |  FROM br b JOIN pairs p ON p.j <= b.bin AND p.k >= b.bin
        |  GROUP BY 1, 2
        |), fits AS (
        |  SELECT bin, MAX(mn) AS iso FROM mns GROUP BY 1
        |)
        |SELECT b.bin, b.n_docs, b.n_dups,
        |  CAST((1000000 * b.n_dups) // b.n_docs AS BIGINT) AS rate_micro,
        |  CAST(f.iso AS BIGINT) AS iso_micro
        |FROM br b JOIN fits f USING (bin)""".stripMargin,

    // q291: per-16-token-window marker argmax (q18's priority rule:
    // en > es > fr > de on ties, und when no evidence), replayed as
    // nested list comprehensions; switch walk over adjacent windows.
    "q291_code_switch" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), pr AS (
        |  SELECT doc_id, lang,
        |    [CASE
        |       WHEN len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) > 0 THEN 'en'
        |       WHEN len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) >= len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) > 0 THEN 'es'
        |       WHEN len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x))) > 0 THEN 'fr'
        |       WHEN len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x))) > 0 THEN 'de'
        |       ELSE 'und' END
        |     FOR sl IN [w[(wi*16+1):(wi*16+16)]
        |                FOR wi IN range(0, (len(w) + 15) // 16)]] AS preds
        |  FROM t
        |)
        |SELECT doc_id, lang,
        |  CAST(len(preds) AS BIGINT) AS n_windows,
        |  CAST(len(list_filter(preds, p -> p = 'und')) AS BIGINT) AS n_und,
        |  CAST(len(list_filter(preds, p -> p <> 'und' AND p <> lang)) AS BIGINT)
        |    AS n_foreign,
        |  CAST(CASE WHEN len(preds) > 1 THEN
        |    len(list_filter(range(2, len(preds) + 1), i -> preds[i] <> preds[i-1]))
        |    ELSE 0 END AS BIGINT) AS n_switches
        |FROM pr""".stripMargin,

    // q292: q56's verified pair graph feeds BOTH the component closure
    // (membership) and the q283 fixed-point PageRank (authority); the
    // election takes (rank desc, doc_id) per cluster.
    "q292_authority_canon" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), sym2 AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), deg2 AS (
        |  SELECT src, COUNT(*) AS outdeg FROM sym2 GROUP BY 1
        |), p0 AS (
        |  SELECT src AS node, CAST(1000000000 AS HUGEINT) AS r FROM deg2
        |), p1 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p0 r ON r.node = s.src
        |  GROUP BY 1
        |), p2 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p1 r ON r.node = s.src
        |  GROUP BY 1
        |), p3 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p2 r ON r.node = s.src
        |  GROUP BY 1
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), mem AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |  FROM reach GROUP BY src
        |), jn AS (
        |  SELECT m.doc_id, m.cluster, CAST(p3.r AS BIGINT) AS rank_ppb
        |  FROM mem m JOIN p3 ON p3.node = m.doc_id
        |)
        |SELECT cluster, doc_id AS rep_doc, rank_ppb AS rep_rank_ppb,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY rank_ppb DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM jn
        |) WHERE rn = 1""".stripMargin,

    // q293: the oracle recomputes the EXPECTED post-sweep state from
    // raw rows — a surviving expired partition or a clobbered live one
    // hash-mismatches either way.
    "q293_retention_sweep" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(*) AS rows_src,
        |  CAST(CASE WHEN strftime(o_orderdate, '%Y-%m') < '1996-01'
        |       THEN 0 ELSE COUNT(*) END AS BIGINT) AS rows_after,
        |  strftime(o_orderdate, '%Y-%m') < '1996-01' AS expired
        |FROM orders GROUP BY 1""".stripMargin,

    // q294: q200's CTEs verbatim (including the 1000-doc md5 audit tier)
    // with both Jaccard gates at 0.5 — the second operating point that
    // moves when band math explodes (or silently narrows) the candidate
    // stream.
    "q294_lsh_recall_audit_t05" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM tier)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.5
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM truth) AS n_truth,
        |  (SELECT COUNT(*) FROM cand) AS n_candidates,
        |  (SELECT COUNT(*) FROM verified) AS n_verified,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0) AS recall,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 0) AS precision
        |FROM (SELECT 1) one""".stripMargin,

    // q295: the incremental update must equal the FULL recompute - q22's
    // oracle verbatim is the strongest possible check of the
    // decomposition pairs(corpus) UNION pairs(delta) UNION cross pairs.
    "q295_delta_pair_update" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |FROM verified
        |WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8""".stripMargin,

    // q296: the q204 Lloyd CTE chain restricted to the standing corpus
    // tier (md5 bucket < 95 — the q295 split), then ONE argmax assignment
    // of the delta tier against the trained centroids. Init replicates
    // the trainer: the first 8 vec_ids OF THE CORPUS TIER (a seed that
    // hashes into the delta is absent — k shrinks identically on both
    // engines).
    "q296_delta_assign" ->
      """WITH bkt AS (
        |  SELECT vec_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM embeddings
        |), qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), qec AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket < 95
        |), qed AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket >= 95
        |), vnc AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qec GROUP BY 1
        |), vnd AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qed GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qec WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vnc v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vnc v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qed q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |)
        |SELECT vec_id, cid FROM (
        |  SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |    ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |  FROM d3 d JOIN vnd v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |) WHERE rn = 1""".stripMargin,

    // q297: the q24 exact top-k chain + label relevance; both metrics
    // are integer floor divisions on the micro grid, so the hash gate
    // sees exact longs on both engines.
    "q297_retrieval_eval" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS ql FROM embeddings WHERE vec_id < 10
        |), pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != q.query_id
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT query_id, neighbor_id, CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cosine FROM pairs
        |), topk AS (
        |  SELECT query_id, neighbor_id, "rank" FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM c
        |  ) WHERE "rank" <= 10
        |), rel AS (
        |  SELECT t.query_id, q.ql, t."rank",
        |    CASE WHEN e.label = q.ql THEN 1 ELSE 0 END AS is_rel
        |  FROM topk t JOIN q ON q.query_id = t.query_id
        |  JOIN embeddings e ON e.vec_id = t.neighbor_id
        |), per AS (
        |  SELECT query_id, ql, CAST(SUM(is_rel) AS BIGINT) AS n_rel_at_k,
        |    MIN(CASE WHEN is_rel = 1 THEN "rank" END) AS first_rank
        |  FROM rel GROUP BY 1, 2
        |), cs AS (
        |  SELECT label, COUNT(*) AS n_label FROM embeddings GROUP BY 1
        |)
        |SELECT p.query_id,
        |  p.n_rel_at_k,
        |  COALESCE(p.first_rank, 0) AS first_rel_rank,
        |  COALESCE(1000000 // p.first_rank, 0) AS mrr_micro,
        |  cs.n_label - 1 AS n_rel_total,
        |  CASE WHEN least(cs.n_label - 1, 10) = 0 THEN 0
        |       ELSE (p.n_rel_at_k * 1000000) // least(cs.n_label - 1, 10) END AS recall_at_k_micro
        |FROM per p JOIN cs ON cs.label = p.ql""".stripMargin,

    // q298: TWO Lloyd chains (the q204 CTE trained on all vectors, the
    // q296 chain trained on the corpus tier), then the per-cid cosine
    // between the two trained codebooks. The final centroids on each
    // side are the iteration-2 means re-quantized (qc2* CTEs) — exactly
    // what the Spark side's fixed-point cosine sees after the float
    // arrays round-trip the derived-store parquet.
    "q298_codebook_drift" ->
      """WITH bkt AS (
        |  SELECT vec_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM embeddings
        |), qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), fqc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), fcn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM fqc0 GROUP BY 1
        |), fd1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN fqc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), fa1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM fd1 d JOIN vn v ON v.vec_id = d.vec_id JOIN fcn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), fm1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM fa1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), fqc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM fm1
        |), fcn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM fqc1 GROUP BY 1
        |), fd2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN fqc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), fa2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM fd2 d JOIN vn v ON v.vec_id = d.vec_id JOIN fcn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), fm2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM fa2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), fqc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM fm2
        |), qec AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket < 95
        |), vnc AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qec GROUP BY 1
        |), sqc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qec WHERE vec_id < 8
        |), scn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM sqc0 GROUP BY 1
        |), sd1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN sqc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), sa1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM sd1 d JOIN vnc v ON v.vec_id = d.vec_id JOIN scn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), sm1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM sa1 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), sqc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM sm1
        |), scn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM sqc1 GROUP BY 1
        |), sd2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN sqc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), sa2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM sd2 d JOIN vnc v ON v.vec_id = d.vec_id JOIN scn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), sm2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM sa2 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), sqc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM sm2
        |), fn AS (
        |  SELECT cid, SUM(qm * qm) AS n2 FROM fqc2 GROUP BY 1
        |), sn AS (
        |  SELECT cid, SUM(qm * qm) AS n2 FROM sqc2 GROUP BY 1
        |), dt AS (
        |  SELECT f.cid, SUM(f.qm * s.qm) AS dot
        |  FROM fqc2 f JOIN sqc2 s ON s.cid = f.cid AND s.pos = f.pos GROUP BY 1
        |)
        |SELECT COALESCE(fn.cid, sn.cid) AS cid,
        |  fn.cid IS NOT NULL AS in_full,
        |  sn.cid IS NOT NULL AS in_standing,
        |  CASE WHEN fn.cid IS NOT NULL AND sn.cid IS NOT NULL
        |       THEN CAST(dt.dot AS DOUBLE) / (sqrt(CAST(fn.n2 AS DOUBLE)) * sqrt(CAST(sn.n2 AS DOUBLE))) END AS cosine
        |FROM fn FULL OUTER JOIN sn ON sn.cid = fn.cid
        |LEFT JOIN dt ON dt.cid = COALESCE(fn.cid, sn.cid)""".stripMargin,

    // q299: the q289 window/island machinery aggregated per
    // (train source, eval source) cell. Per-window md5 on the oracle
    // side (the independent fingerprint family — same hit set as the
    // KR kernel); islands partition by (doc, eval_source) so a span
    // contaminated by two eval sources counts in both cells.
    "q299_contamination_matrix" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, source, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), ev AS (
        |  SELECT DISTINCT fp, source AS eval_source FROM pos WHERE doc_id % 10 = 3
        |), hits AS (
        |  SELECT pos.doc_id, pos.source AS train_source, ev.eval_source, pos.p
        |  FROM pos JOIN ev USING (fp) WHERE pos.doc_id % 10 <> 3
        |), isl AS (
        |  SELECT doc_id, train_source, eval_source, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id, eval_source ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, train_source, eval_source, p,
        |          lag(p) OVER (PARTITION BY doc_id, eval_source ORDER BY p) AS prev
        |        FROM hits)
        |), agg AS (
        |  SELECT train_source, eval_source, doc_id, island,
        |    MIN(p) AS s, MAX(p) + 7 AS e, COUNT(*) AS nw
        |  FROM isl GROUP BY 1, 2, 3, 4
        |)
        |SELECT train_source, eval_source,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS n_windows,
        |  CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens
        |FROM agg GROUP BY 1, 2""".stripMargin,

    // q300: the q22 verified-pair chain + eval-boundary orientation +
    // the per-source-cell aggregate. Pair orientation is canonical
    // (doc_a < doc_b), so a crossing pair counts once with its
    // train/eval roles resolved per row.
    "q300_neardup_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pr AS (
        |  SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |  FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), x AS (
        |  SELECT CASE WHEN doc_a % 10 = 3 THEN doc_b ELSE doc_a END AS train_doc,
        |         CASE WHEN doc_a % 10 = 3 THEN doc_a ELSE doc_b END AS eval_doc,
        |         jaccard
        |  FROM pr WHERE (doc_a % 10 = 3) <> (doc_b % 10 = 3)
        |)
        |SELECT ts.source AS train_source, es.source AS eval_source,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(DISTINCT x.train_doc) AS BIGINT) AS n_train_docs,
        |  MAX(CAST(floor(jaccard * 1e6) AS BIGINT)) AS max_jaccard_micro
        |FROM x JOIN documents ts ON ts.doc_id = x.train_doc
        |JOIN documents es ON es.doc_id = x.eval_doc
        |GROUP BY 1, 2""".stripMargin,
  )
}
