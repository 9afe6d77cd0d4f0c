package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Curation, Dedup, Multimodal, Packing, Relational, Similarity, TextAnalysis, TimeSeries}
import graft.traffic.Traffic

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Every implemented operator has a `queries` entry; every
  * SQL-expressible one also has a DuckDB `oracleSql` entry, built
  * exclusively from Portable (md5 / exact-decimal) expressions so the
  * driver's hash compare is deterministic across engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Traffic.maxFlowSliding(t(spark, "/root/testdata/sf0.001", "events"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 reference surface
    "q_injector_filter" -> ((s, d) => Traffic.injectorFilter(t(s, d, "documents"))),
    "q_starter_upper" -> ((s, d) => Traffic.starterUpper(t(s, d, "documents"))),
    "q_extract_lanes" -> ((s, d) => Traffic.extractLanes(Traffic.csvLines(t(s, d, "events")))),
    "q_max_flow_global" -> ((s, d) => Traffic.maxFlowGlobal(t(s, d, "events"))),
    "q_max_flow_sliding" -> ((s, d) => Traffic.maxFlowSliding(t(s, d, "events"))),
    "q_max_flow_sliding_60_1" -> ((s, d) => Traffic.maxFlowSlidingScan(t(s, d, "events"))),
    "q_max_flow_e2e" -> ((s, d) => Traffic.maxLaneFlowE2eScan(t(s, d, "events"))),
    "q_max_flow_sliding_60_1_dense" -> ((s, d) =>
      Traffic.maxFlowSlidingAuto(Traffic.densify(t(s, d, "events")))),
    // §2.2 engine core
    "q1_agg" -> ((s, d) => Relational.q1Agg(t(s, d, "lineitem"))),
    "q_join_revenue" -> ((s, d) => Relational.joinRevenue(
      t(s, d, "lineitem"), t(s, d, "orders"), t(s, d, "customer"),
      t(s, d, "nation"), t(s, d, "region"))),
    "q_topk_orders" -> ((s, d) => Relational.topkOrders(t(s, d, "orders"))),
    "q_running_sum" -> ((s, d) => Relational.runningSum(t(s, d, "orders"))),
    "q_rolling_range" -> ((s, d) => Relational.rollingRange(t(s, d, "orders"))),
    "q_ewma" -> ((s, d) => TimeSeries.ewma(t(s, d, "events"))),
    "q_holt" -> ((s, d) => TimeSeries.holt(t(s, d, "events"))),
    "q_sessionize" -> ((s, d) => Relational.sessionize(t(s, d, "events"))),
    "q_session_window" -> ((s, d) => Relational.sessionWindow(t(s, d, "events"))),
    "q_window_tumbling" -> ((s, d) => Relational.windowTumbling(t(s, d, "events"))),
    "q_distinct_users" -> ((s, d) => Relational.distinctUsers(t(s, d, "events"))),
    "q_hll_rolling" -> ((s, d) => Relational.hllRollingDistinct(t(s, d, "events"))),
    "q_funnel" -> ((s, d) => Relational.funnel(t(s, d, "events"))),
    "q_cohort" -> ((s, d) => Relational.cohortRetention(t(s, d, "events"))),
    "q_scd2" -> ((s, d) => Relational.scd2Merge(t(s, d, "customer"))),
    "q_anti_join" -> ((s, d) => Relational.antiJoin(t(s, d, "customer"), t(s, d, "orders"))),
    "q_json_extract" -> ((s, d) => Relational.jsonExtract(t(s, d, "events"))),
    "q_pivot_events" -> ((s, d) => Relational.pivotEvents(t(s, d, "events"))),
    "q_asof_join" -> ((s, d) => Relational.asofJoin(t(s, d, "events"), t(s, d, "orders"))),
    "q_asof_join_native" -> ((s, d) =>
      Relational.asofJoinNative(t(s, d, "events"), t(s, d, "orders"))),
    "q_asof_forward" -> ((s, d) =>
      Relational.asofJoinForward(t(s, d, "events"), t(s, d, "orders"))),
    "q_asof_tolerance" -> ((s, d) =>
      Relational.asofJoinTolerance(t(s, d, "events"), t(s, d, "orders"))),
    "q_asof_string_key" -> ((s, d) =>
      Relational.asofJoinStringKey(t(s, d, "events"), t(s, d, "orders"))),
    "q_rollup_revenue" -> ((s, d) => Relational.rollupRevenue(
      t(s, d, "orders"), t(s, d, "customer"), t(s, d, "nation"))),
    "q_percentiles" -> ((s, d) => Relational.percentiles(t(s, d, "orders"))),
    "q_percentiles_approx" -> ((s, d) => Relational.percentilesApprox(t(s, d, "orders"))),
    "q_cube_revenue" -> ((s, d) => Relational.cubeRevenue(
      t(s, d, "orders"), t(s, d, "customer"), t(s, d, "nation"))),
    "q_ranking" -> ((s, d) => Relational.rankingFunctions(t(s, d, "orders"))),
    "q_stats" -> ((s, d) => Relational.stats(t(s, d, "orders"))),
    "q_histogram" -> ((s, d) => Relational.histogram(t(s, d, "events"))),
    "q_set_ops" -> ((s, d) => Relational.setOps(t(s, d, "orders"), t(s, d, "lineitem"))),
    "q_grouping_sets" -> ((s, d) => Relational.groupingSetsRevenue(
      t(s, d, "orders"), t(s, d, "customer"), t(s, d, "nation"))),
    "q_gap_fill" -> ((s, d) => Relational.gapFill(t(s, d, "events"))),
    "q_interval_join" -> ((s, d) =>
      Relational.intervalJoin(t(s, d, "orders"), t(s, d, "lineitem"))),
    "q_anomaly" -> ((s, d) => Relational.anomalyFlags(t(s, d, "events"))),
    "q_window_distinct" -> ((s, d) => Relational.windowDistinct(t(s, d, "events"))),
    // §2.3 LLM-data operators
    "q_dedup_exact" -> ((s, d) => Dedup.exact(t(s, d, "documents"))),
    "q_dedup_ngram" -> ((s, d) => Dedup.ngramJaccard(t(s, d, "documents"))),
    "q_prefix_join" -> ((s, d) => Dedup.prefixJoin(t(s, d, "documents"))),
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(t(s, d, "documents"))),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashDedup(t(s, d, "documents"))),
    "q_dedup_embedding" -> ((s, d) => Similarity.embeddingNearDup(t(s, d, "embeddings"))),
    "q_dedup_clusters" -> ((s, d) => Dedup.dedupClusters(t(s, d, "documents"))),
    "q_fuzzy_names" -> ((s, d) => Dedup.fuzzyNames(t(s, d, "customer"))),
    "q_dedup_chunk" -> ((s, d) => Dedup.chunkDedup(t(s, d, "documents"))),
    "q_dup_spans" -> ((s, d) => Dedup.dupSpans(t(s, d, "documents"))),
    "q_dedup_incremental" -> ((s, d) => Dedup.incrementalDedup(t(s, d, "documents"))),
    "q_normalize" -> ((s, d) => TextAnalysis.normalize(t(s, d, "documents"))),
    "q_seq_pack" -> ((s, d) => Packing.packSequences(t(s, d, "documents"))),
    "q_curation_e2e" -> ((s, d) => Curation.curationPipeline(t(s, d, "documents"))),
    "q_contamination" -> ((s, d) => Curation.contamination(t(s, d, "documents"))),
    "q_contamination_near" -> ((s, d) => Dedup.minhashContamination(t(s, d, "documents"))),
    "q_contamination_bloom" -> ((s, d) => Curation.bloomContamination(t(s, d, "documents"))),
    "q_weighted_sample" -> ((s, d) => Curation.weightedSample(t(s, d, "documents"))),
    "q_det_sample" -> ((s, d) => Curation.deterministicSample(t(s, d, "documents"))),
    "q_source_mixture" -> ((s, d) => Curation.sourceMixture(t(s, d, "documents"))),
    "q_budget_select" -> ((s, d) => Curation.budgetSelect(t(s, d, "documents"))),
    "q_ann_topk" -> ((s, d) => Similarity.annTopK(t(s, d, "embeddings"))),
    "q_knn_graph" -> ((s, d) => Similarity.knnGraph(t(s, d, "embeddings"))),
    "q_semdedup" -> ((s, d) => Similarity.semDedup(t(s, d, "embeddings"))),
    "q_quantize" -> ((s, d) => Similarity.quantize(t(s, d, "embeddings"))),
    "q_ann_lsh" -> ((s, d) => Similarity.annLsh(t(s, d, "embeddings"))),
    "q_ann_ivf" -> ((s, d) => Similarity.annIvf(t(s, d, "embeddings"))),
    "q_ann_ivf2" -> ((s, d) => Similarity.annIvf2(t(s, d, "embeddings"))),
    "q_lang_id" -> ((s, d) => TextAnalysis.langId(t(s, d, "documents"))),
    "q_quality" -> ((s, d) => TextAnalysis.quality(t(s, d, "documents"))),
    "q_token_count" -> ((s, d) => TextAnalysis.tokenCount(t(s, d, "documents"))),
    "q_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(t(s, d, "documents"))),
    "q_term_freq" -> ((s, d) => TextAnalysis.termFreq(t(s, d, "documents"))),
    "q_build_vocab" -> ((s, d) => TextAnalysis.buildVocab(t(s, d, "documents"))),
    "q_freq_cms" -> ((s, d) => TextAnalysis.cmsFrequencies(t(s, d, "documents"))),
    "q_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(t(s, d, "documents"))),
    "q_pmi" -> ((s, d) => TextAnalysis.pmi(t(s, d, "documents"))),
    "q_training_shards" -> ((s, d) => Curation.trainingShards(t(s, d, "documents"))),
    "q_tfidf" -> ((s, d) => TextAnalysis.tfidf(t(s, d, "documents"))),
    "q_bigrams" -> ((s, d) => TextAnalysis.bigrams(t(s, d, "documents"))),
    "q_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(t(s, d, "documents"))),
    "q_repetition" -> ((s, d) => TextAnalysis.repetition(t(s, d, "documents"))),
    "q_pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(t(s, d, "documents"))),
    "q_lm_score" -> ((s, d) => TextAnalysis.lmScore(t(s, d, "documents"))),
    "q_hashed_classifier" -> ((s, d) => TextAnalysis.hashedClassifier(t(s, d, "documents"))),
    "q_multimodal_meta" -> ((s, d) => Multimodal.metaQuery(t(s, d, "documents"))),
    "q_multimodal_frames" -> ((s, d) => Multimodal.framesQuery(t(s, d, "documents"))),
    "q_multimodal_decode" -> ((s, d) => Multimodal.ppmDecodeQuery(t(s, d, "documents"))),
    "q_multimodal_resize" -> ((s, d) => Multimodal.resizeQuery(t(s, d, "documents"))),
    "q_multimodal_wav" -> ((s, d) => Multimodal.wavDecodeQuery(t(s, d, "documents"))),
    "q_multimodal_bmp" -> ((s, d) => Multimodal.bmpDecodeQuery(t(s, d, "documents"))),
    "q_image_phash" -> ((s, d) => Multimodal.imagePhashDedup(t(s, d, "documents"))),
    "q_image_neardup" -> ((s, d) => Multimodal.imageNearDup(t(s, d, "documents"))))

  /** DuckDB oracles; q_ann_lsh is intentionally absent (LSH bucketing
    * is the non-SQL scale path; its recall is ScalaTest-verified
    * against q_ann_topk). */
  def oracleSql: Map[String, String] = Map(
    "q_injector_filter" -> Traffic.injectorFilterSql,
    "q_starter_upper" -> Traffic.starterUpperSql,
    "q_extract_lanes" -> Traffic.extractLanesSql,
    "q_max_flow_global" -> Traffic.maxFlowGlobalSql,
    "q_max_flow_sliding" -> Traffic.maxFlowSlidingSql,
    "q_max_flow_sliding_60_1" -> Traffic.maxFlowSliding60x1Sql,
    "q_max_flow_e2e" -> Traffic.maxLaneFlowE2eSql,
    "q_max_flow_sliding_60_1_dense" -> Traffic.maxFlowSlidingDenseSql,
    "q1_agg" -> Relational.q1AggSql,
    "q_join_revenue" -> Relational.joinRevenueSql,
    "q_topk_orders" -> Relational.topkOrdersSql,
    "q_running_sum" -> Relational.runningSumSql,
    "q_rolling_range" -> Relational.rollingRangeSql,
    "q_ewma" -> TimeSeries.ewmaSql,
    "q_holt" -> TimeSeries.holtSql,
    "q_sessionize" -> Relational.sessionizeSql,
    "q_session_window" -> Relational.sessionWindowSql,
    "q_window_tumbling" -> Relational.windowTumblingSql,
    "q_distinct_users" -> Relational.distinctUsersSql,
    "q_funnel" -> Relational.funnelSql,
    "q_cohort" -> Relational.cohortRetentionSql,
    "q_scd2" -> Relational.scd2MergeSql,
    "q_anti_join" -> Relational.antiJoinSql,
    "q_json_extract" -> Relational.jsonExtractSql,
    "q_pivot_events" -> Relational.pivotEventsSql,
    "q_asof_join" -> Relational.asofJoinSql,
    "q_asof_join_native" -> Relational.asofJoinSql,
    "q_asof_forward" -> Relational.asofForwardSql,
    "q_asof_tolerance" -> Relational.asofToleranceSql,
    "q_asof_string_key" -> Relational.asofStringKeySql,
    "q_rollup_revenue" -> Relational.rollupRevenueSql,
    "q_percentiles" -> Relational.percentilesSql,
    "q_cube_revenue" -> Relational.cubeRevenueSql,
    "q_ranking" -> Relational.rankingFunctionsSql,
    "q_stats" -> Relational.statsSql,
    "q_histogram" -> Relational.histogramSql,
    "q_set_ops" -> Relational.setOpsSql,
    "q_grouping_sets" -> Relational.groupingSetsRevenueSql,
    "q_gap_fill" -> Relational.gapFillSql,
    "q_interval_join" -> Relational.intervalJoinSql,
    "q_anomaly" -> Relational.anomalyFlagsSql,
    "q_window_distinct" -> Relational.windowDistinctSql,
    "q_dedup_exact" -> Dedup.exactSql,
    "q_dedup_ngram" -> Dedup.ngramJaccardSql,
    "q_prefix_join" -> Dedup.prefixJoinSql,
    "q_dedup_minhash" -> Dedup.minhashLshSql,
    "q_dedup_simhash" -> Dedup.simhashDedupSql,
    "q_dedup_embedding" -> Similarity.embeddingNearDupSql,
    "q_dedup_clusters" -> Dedup.dedupClustersSql,
    "q_fuzzy_names" -> Dedup.fuzzyNamesSql,
    "q_dedup_chunk" -> Dedup.chunkDedupSql,
    "q_dup_spans" -> Dedup.dupSpansSql,
    "q_dedup_incremental" -> Dedup.incrementalDedupSql,
    "q_normalize" -> TextAnalysis.normalizeSql,
    "q_seq_pack" -> Packing.packSequencesSql,
    "q_curation_e2e" -> Curation.curationPipelineSql,
    "q_contamination" -> Curation.contaminationSql,
    "q_contamination_near" -> Dedup.minhashContaminationSql,
    "q_contamination_bloom" -> Curation.bloomContaminationSql,
    "q_weighted_sample" -> Curation.weightedSampleSql,
    "q_det_sample" -> Curation.deterministicSampleSql,
    "q_source_mixture" -> Curation.sourceMixtureSql,
    "q_budget_select" -> Curation.budgetSelectSql,
    "q_ann_topk" -> Similarity.annTopKSql,
    "q_knn_graph" -> Similarity.knnGraphSql,
    "q_semdedup" -> Similarity.semDedupSql,
    "q_quantize" -> Similarity.quantizeSql,
    "q_lang_id" -> TextAnalysis.langIdSql,
    "q_quality" -> TextAnalysis.qualitySql,
    "q_token_count" -> TextAnalysis.tokenCountSql,
    "q_bpe_encode" -> TextAnalysis.bpeEncodeSql,
    "q_term_freq" -> TextAnalysis.termFreqSql,
    "q_build_vocab" -> TextAnalysis.buildVocabSql,
    "q_freq_cms" -> TextAnalysis.cmsFrequenciesSql,
    "q_heavy_hitters" -> TextAnalysis.heavyHittersSql,
    "q_pmi" -> TextAnalysis.pmiSql,
    "q_training_shards" -> Curation.trainingShardsSql,
    "q_tfidf" -> TextAnalysis.tfidfSql,
    "q_bigrams" -> TextAnalysis.bigramsSql,
    "q_fingerprint" -> TextAnalysis.fingerprintSql,
    "q_repetition" -> TextAnalysis.repetitionSql,
    "q_pii_scrub" -> TextAnalysis.piiScrubSql,
    "q_lm_score" -> TextAnalysis.lmScoreSql,
    "q_hashed_classifier" -> TextAnalysis.hashedClassifierSql,
    "q_multimodal_meta" -> Multimodal.metaQuerySql,
    "q_multimodal_frames" -> Multimodal.framesQuerySql,
    "q_multimodal_decode" -> Multimodal.ppmDecodeQuerySql,
    "q_multimodal_resize" -> Multimodal.resizeQuerySql,
    "q_multimodal_wav" -> Multimodal.wavDecodeQuerySql,
    "q_multimodal_bmp" -> Multimodal.bmpDecodeQuerySql,
    "q_image_phash" -> Multimodal.imagePhashDedupSql,
    "q_image_neardup" -> Multimodal.imageNearDupSql)
}
