package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key below is a qname from SURVEY.md §2's operator inventory; the
  * implementation lives in `graft.queries.*` (thin declared queries) on
  * top of `graft.engine.*` (the reusable operator library).
  */
object SparkEntry {

  /** All declared queries with their optional DuckDB oracle twins. */
  def registry: Map[String, Declared] = Map(
    // §2.1 scans
    "scan_parquet" -> Declared(Scans.scanParquet _, Scans.scanParquetSql),
    "scan_csv" -> Declared(Scans.scanCsv _, Scans.scanCsvSql),
    "scan_json" -> Declared(Scans.scanJson _, Scans.scanJsonSql),
    "scan_orc" -> Declared(Scans.scanOrc _, Scans.scanOrcSql),
    // NOTE: builds eagerly (writes the Derby table + one MIN/MAX bounds
    // query) before returning the lazy partitioned-JDBC read plan
    "scan_jdbc_partitioned" -> Declared(Scans.scanJdbcPartitioned _, Scans.scanJdbcPartitionedSql),
    "scan_text" -> Declared(Scans.scanText _, Scans.scanTextSql),
    "scan_hive_partitioned" -> Declared(Scans.scanHivePartitioned _, Scans.scanHivePartitionedSql),
    // §2.2 row ops
    "project_rename" -> Declared(RowOps.projectRename _, RowOps.projectRenameSql),
    "filter_pred" -> Declared(RowOps.filterPred _, RowOps.filterPredSql),
    "cast_types" -> Declared(RowOps.castTypes _, RowOps.castTypesSql),
    "null_handling" -> Declared(RowOps.nullHandling _, RowOps.nullHandlingSql),
    "case_when_isin" -> Declared(RowOps.caseWhenIsin _, RowOps.caseWhenIsinSql),
    "explode_array" -> Declared(RowOps.explodeArray _, RowOps.explodeArraySql),
    "melt_unpivot" -> Declared(RowOps.meltUnpivot _, RowOps.meltUnpivotSql),
    "onehot_priority" -> Declared(RowOps.onehotPriority _, RowOps.onehotPrioritySql),
    // §2.3 joins
    "join_inner_equi" -> Declared(Joins.joinInnerEqui _, Joins.joinInnerEquiSql),
    "join_left" -> Declared(Joins.joinLeft _, Joins.joinLeftSql),
    "join_full" -> Declared(Joins.joinFull _, Joins.joinFullSql),
    "join_semi" -> Declared(Joins.joinSemi _, Joins.joinSemiSql),
    "join_anti" -> Declared(Joins.joinAnti _, Joins.joinAntiSql),
    "join_broadcast" -> Declared(Joins.joinBroadcast _, Joins.joinBroadcastSql),
    "join_cross" -> Declared(Joins.joinCross _, Joins.joinCrossSql),
    "join_range_theta" -> Declared(Joins.joinRangeTheta _, Joins.joinRangeThetaSql),
    "join_range_bucketed" -> Declared(Joins.joinRangeBucketed _, Joins.joinRangeBucketedSql),
    "join_interval_overlap" -> Declared(Joins.joinIntervalOverlap _, Joins.joinIntervalOverlapSql),
    "join_fuzzy_levenshtein" -> Declared(Joins.joinFuzzyLevenshtein _, Joins.joinFuzzyLevenshteinSql),
    "join_asof" -> Declared(Joins.joinAsof _, Joins.joinAsofSql),
    "join_asof_split" -> Declared(Joins.joinAsofSplit _, Joins.joinAsofSplitSql),
    "join_asof_nearest" -> Declared(Joins.joinAsofNearest _, Joins.joinAsofNearestSql),
    "merge_upsert" -> Declared(Joins.mergeUpsert _, Joins.mergeUpsertSql),
    "join_indicator" -> Declared(Joins.joinIndicator _, Joins.joinIndicatorSql),
    "join_bloom_prefilter" -> Declared(Joins.joinBloomPrefilter _, Joins.joinBloomPrefilterSql),
    "merge_scd2" -> Declared(Joins.mergeScd2 _, Joins.mergeScd2Sql),
    "join_validated" -> Declared(Joins.joinValidated _, Joins.joinValidatedSql),
    // §2.4 aggregations
    "agg_basic" -> Declared(Aggregations.aggBasic _, Aggregations.aggBasicSql),
    "agg_var_std" -> Declared(Aggregations.aggVarStd _, Aggregations.aggVarStdSql),
    "agg_firstlast_by" -> Declared(Aggregations.aggFirstlastBy _, Aggregations.aggFirstlastBySql),
    "agg_count_distinct" -> Declared(Aggregations.aggCountDistinct _, Aggregations.aggCountDistinctSql),
    "agg_quantile" -> Declared(Aggregations.aggQuantile _, Aggregations.aggQuantileSql),
    "agg_corr_cov" -> Declared(Aggregations.aggCorrCov _, Aggregations.aggCorrCovSql),
    "agg_rollup" -> Declared(Aggregations.aggRollup _, Aggregations.aggRollupSql),
    "agg_cube" -> Declared(Aggregations.aggCube _, Aggregations.aggCubeSql),
    "agg_heavy_hitters" -> Declared(Aggregations.aggHeavyHitters _, Aggregations.aggHeavyHittersSql),
    // NOTE: agg_describe executes EAGERLY at build time (ExactQuantiles
    // distributed selection needs driver-side offset math; the 100 TB
    // posture — Spark's lazy `percentile` would single-reduce a
    // value map). Its returned frame is a LocalRelation of final stats.
    "agg_describe" -> Declared(Aggregations.aggDescribe _, Aggregations.aggDescribeSql),
    "pivot_events" -> Declared(Aggregations.pivotEvents _, Aggregations.pivotEventsSql),
    "agg_mode" -> Declared(Aggregations.aggMode _, Aggregations.aggModeSql),
    // rows-only by design: DataSketches HLL estimates are
    // engine-specific constants (SketchSpec pins bounds + mergeability)
    "agg_distinct_sketch" -> Declared(Aggregations.aggDistinctSketch _, None),
    "agg_skew_kurt" -> Declared(Aggregations.aggSkewKurt _, Aggregations.aggSkewKurtSql),
    "agg_corr_matrix" -> Declared(Aggregations.aggCorrMatrix _, Aggregations.aggCorrMatrixSql),
    "agg_cov_matrix" -> Declared(Aggregations.aggCovMatrix _, Aggregations.aggCovMatrixSql),
    "agg_grouping_sets" -> Declared(Aggregations.aggGroupingSets _, Aggregations.aggGroupingSetsSql),
    // rows-only by design: KLL estimates depend on sketch internals
    // (SketchSpec pins the rank-error bound + mergeability)
    "agg_quantile_sketch" -> Declared(Aggregations.aggQuantileSketch _, None),
    // rows-only by design: estimates depend on Misra-Gries compaction
    // internals (SketchSpec pins bounds-contain-truth + no-false-negatives)
    "agg_freq_sketch" -> Declared(Aggregations.aggFreqSketch _, None),
    "agg_histogram" -> Declared(Aggregations.aggHistogram _, Aggregations.aggHistogramSql),
    "agg_value_counts" -> Declared(Aggregations.aggValueCounts _, Aggregations.aggValueCountsSql),
    "agg_any_all" -> Declared(Aggregations.aggAnyAll _, Aggregations.aggAnyAllSql),
    // §2.5 windows / time-series (+§2.8 batch forms)
    "window_rolling_rows" -> Declared(Windows.windowRollingRows _, Windows.windowRollingRowsSql),
    "window_rolling_range" -> Declared(Windows.windowRollingRange _, Windows.windowRollingRangeSql),
    "window_rolling_corr" -> Declared(Windows.windowRollingCorr _, Windows.windowRollingCorrSql),
    "window_lag_diff" -> Declared(Windows.windowLagDiff _, Windows.windowLagDiffSql),
    "window_cumulative" -> Declared(Windows.windowCumulative _, Windows.windowCumulativeSql),
    "window_pct_change" -> Declared(Windows.windowPctChange _, Windows.windowPctChangeSql),
    "window_expanding" -> Declared(Windows.windowExpanding _, Windows.windowExpandingSql),
    "window_rank_topn" -> Declared(Windows.windowRankTopn _, Windows.windowRankTopnSql),
    "window_rank_methods" -> Declared(Windows.windowRankMethods _, Windows.windowRankMethodsSql),
    "window_fill_directional" -> Declared(Windows.windowFillDirectional _, Windows.windowFillDirectionalSql),
    "window_interpolate" -> Declared(Windows.windowInterpolate _, Windows.windowInterpolateSql),
    "window_rolling_median" -> Declared(Windows.windowRollingMedian _, Windows.windowRollingMedianSql),
    "window_group_transform" -> Declared(Windows.windowGroupTransform _, Windows.windowGroupTransformSql),
    "window_first_last" -> Declared(Windows.windowFirstLast _, Windows.windowFirstLastSql),
    "window_ewm" -> Declared(Windows.windowEwm _, Windows.windowEwmSql),
    "window_ewm_scan" -> Declared(Windows.windowEwmScan _, Windows.windowEwmScanSql),
    "dedup_keep_first" -> Declared(Windows.dedupKeepFirst _, Windows.dedupKeepFirstSql),
    "ts_tumbling_day" -> Declared(Windows.tsTumblingDay _, Windows.tsTumblingDaySql),
    "ts_tumbling_month" -> Declared(Windows.tsTumblingMonth _, Windows.tsTumblingMonthSql),
    "ts_tumbling_week" -> Declared(Windows.tsTumblingWeek _, Windows.tsTumblingWeekSql),
    "ts_resample_upsample" -> Declared(Windows.tsResampleUpsample _, Windows.tsResampleUpsampleSql),
    "ts_sessionize_gap30m" -> Declared(Windows.tsSessionizeGap30m _, Windows.tsSessionizeGap30mSql),
    "ts_sessionize_split" -> Declared(Windows.tsSessionizeSplit _, Windows.tsSessionizeSplitSql),
    "ts_sliding_hour" -> Declared(Windows.tsSlidingHour _, Windows.tsSlidingHourSql),
    "sql_q3_shipping" -> Declared(SqlFrontend.sqlQ3Shipping _, SqlFrontend.sqlQ3ShippingSql),
    "sql_q5_local_supplier" -> Declared(SqlFrontend.sqlQ5LocalSupplier _, SqlFrontend.sqlQ5LocalSupplierSql),
    "sql_q10_returned_items" -> Declared(SqlFrontend.sqlQ10ReturnedItems _, SqlFrontend.sqlQ10ReturnedItemsSql),
    "sql_q14_promo_share" -> Declared(SqlFrontend.sqlQ14PromoShare _, SqlFrontend.sqlQ14PromoShareSql),
    "sql_q4_order_priority" -> Declared(SqlFrontend.sqlQ4OrderPriority _, SqlFrontend.sqlQ4OrderPrioritySql),
    "sql_q17_small_qty" -> Declared(SqlFrontend.sqlQ17SmallQty _, SqlFrontend.sqlQ17SmallQtySql),
    "sql_q21_waiting_supplier" -> Declared(SqlFrontend.sqlQ21WaitingSupplier _, SqlFrontend.sqlQ21WaitingSupplierSql),
    "sql_q20_potential_promotion" -> Declared(SqlFrontend.sqlQ20PotentialPromotion _, SqlFrontend.sqlQ20PotentialPromotionSql),
    "sql_q15_top_supplier" -> Declared(SqlFrontend.sqlQ15TopSupplier _, SqlFrontend.sqlQ15TopSupplierSql),
    "sql_q2_min_cost_supplier" -> Declared(SqlFrontend.sqlQ2MinCostSupplier _, SqlFrontend.sqlQ2MinCostSupplierSql),
    "sql_q13_customer_distribution" -> Declared(SqlFrontend.sqlQ13CustomerDistribution _, SqlFrontend.sqlQ13CustomerDistributionSql),
    "sql_q18_large_orders" -> Declared(SqlFrontend.sqlQ18LargeOrders _, SqlFrontend.sqlQ18LargeOrdersSql),
    "sql_q19_discounted_revenue" -> Declared(SqlFrontend.sqlQ19DiscountedRevenue _, SqlFrontend.sqlQ19DiscountedRevenueSql),
    "sql_q1_pricing_summary" -> Declared(SqlFrontend.sqlQ1PricingSummary _, SqlFrontend.sqlQ1PricingSummarySql),
    "sql_q6_revenue_change" -> Declared(SqlFrontend.sqlQ6RevenueChange _, SqlFrontend.sqlQ6RevenueChangeSql),
    "sql_q7_volume_shipping" -> Declared(SqlFrontend.sqlQ7VolumeShipping _, SqlFrontend.sqlQ7VolumeShippingSql),
    "sql_q8_market_share" -> Declared(SqlFrontend.sqlQ8MarketShare _, SqlFrontend.sqlQ8MarketShareSql),
    "sql_q9_product_profit" -> Declared(SqlFrontend.sqlQ9ProductProfit _, SqlFrontend.sqlQ9ProductProfitSql),
    "sql_q11_important_stock" -> Declared(SqlFrontend.sqlQ11ImportantStock _, SqlFrontend.sqlQ11ImportantStockSql),
    "sql_q12_priority_split" -> Declared(SqlFrontend.sqlQ12PrioritySplit _, SqlFrontend.sqlQ12PrioritySplitSql),
    "sql_q16_supplier_count" -> Declared(SqlFrontend.sqlQ16SupplierCount _, SqlFrontend.sqlQ16SupplierCountSql),
    "sql_q22_global_sales" -> Declared(SqlFrontend.sqlQ22GlobalSales _, SqlFrontend.sqlQ22GlobalSalesSql),
    "sql_window_topshare" -> Declared(SqlFrontend.sqlWindowTopShare _, SqlFrontend.sqlWindowTopShareSql),
    // §2.6 sort / limit / top-k / set ops / dedup
    "sort_multi_key" -> Declared(SortSetOps.sortMultiKey _, SortSetOps.sortMultiKeySql),
    "sort_limit" -> Declared(SortSetOps.sortLimit _, SortSetOps.sortLimitSql),
    "topk_nlargest" -> Declared(SortSetOps.topkNlargest _, SortSetOps.topkNlargestSql),
    "dedup_exact" -> Declared(SortSetOps.dedupExact _, SortSetOps.dedupExactSql),
    "setop_union_all" -> Declared(SortSetOps.setopUnionAll _, SortSetOps.setopUnionAllSql),
    "setop_union_distinct" -> Declared(SortSetOps.setopUnionDistinct _, SortSetOps.setopUnionDistinctSql),
    "setop_intersect_except" -> Declared(SortSetOps.setopIntersectExcept _, SortSetOps.setopIntersectExceptSql),
    "setop_all_variants" -> Declared(SortSetOps.setopAllVariants _, SortSetOps.setopAllVariantsSql),
    "topk_nsmallest" -> Declared(SortSetOps.topkNsmallest _, SortSetOps.topkNsmallestSql),
    "groupby_head" -> Declared(SortSetOps.groupbyHead _, SortSetOps.groupbyHeadSql),
    "groupby_tail" -> Declared(SortSetOps.groupbyTail _, SortSetOps.groupbyTailSql),
    // §2.7 scalar functions
    "scalar_string" -> Declared(Scalars.scalarString _, Scalars.scalarStringSql),
    "scalar_datetime" -> Declared(Scalars.scalarDatetime _, Scalars.scalarDatetimeSql),
    "scalar_math" -> Declared(Scalars.scalarMath _, Scalars.scalarMathSql),
    "scalar_array" -> Declared(Scalars.scalarArray _, Scalars.scalarArraySql),
    "scalar_json" -> Declared(Scalars.scalarJson _, Scalars.scalarJsonSql),
    // §2.9 text analysis + document dedup
    "text_token_freq" -> Declared(TextOps.textTokenFreq _, TextOps.textTokenFreqSql),
    "text_normalize" -> Declared(TextOps.textNormalize _, TextOps.textNormalizeSql),
    "text_profile_by_lang" -> Declared(TextOps.textProfileByLang _, TextOps.textProfileByLangSql),
    "text_token_count" -> Declared(TextOps.textTokenCount _, TextOps.textTokenCountSql),
    // round 17: merge-table greedy BPE token budget — encode once per
    // distinct word, join counts back; oracle replays the identical
    // replace chain generated from the same merge list
    "text_token_count_bpe" -> Declared(TextOps.textTokenCountBpe _, TextOps.textTokenCountBpeSql),
    "text_quality_score" -> Declared(TextOps.textQualityScore _, TextOps.textQualityScoreSql),
    "text_langid" -> Declared(TextOps.textLangid _, TextOps.textLangidSql),
    "text_bigram_lm_score" -> Declared(TextOps.textBigramLmScore _, TextOps.textBigramLmScoreSql),
    "pipe_clean" -> Declared(TextOps.pipeClean _, TextOps.pipeCleanSql),
    "text_repetition" -> Declared(TextOps.textRepetition _, TextOps.textRepetitionSql),
    "text_pii_redact" -> Declared(TextOps.textPiiRedact _, TextOps.textPiiRedactSql),
    "text_decontaminate" -> Declared(TextOps.textDecontaminate _, TextOps.textDecontaminateSql),
    "text_url_stats" -> Declared(TextOps.textUrlStats _, TextOps.textUrlStatsSql),
    "text_fingerprint" -> Declared(TextOps.textFingerprint _, None),
    "dedup_docs_exact" -> Declared(TextOps.dedupDocsExact _, TextOps.dedupDocsExactSql),
    "dedup_docs_ngram_jaccard" -> Declared(TextOps.dedupDocsNgramJaccard _, TextOps.dedupDocsNgramJaccardSql),
    "dedup_docs_containment" -> Declared(TextOps.dedupDocsContainment _, TextOps.dedupDocsContainmentSql),
    "dedup_docs_ngram_indexed" -> Declared(TextOps.dedupDocsNgramIndexed _, TextOps.dedupDocsNgramJaccardSql),
    "dedup_docs_ngram_join" -> Declared(TextOps.dedupDocsNgramJoin _, TextOps.dedupDocsNgramJoinSql),
    "dedup_docs_components" -> Declared(TextOps.dedupDocsComponents _, TextOps.dedupDocsComponentsSql),
    "dedup_docs_minhash" -> Declared(TextOps.dedupDocsMinhash _, None),
    "dedup_docs_simhash" -> Declared(TextOps.dedupDocsSimhash _, None),
    // §2.9 embeddings / similarity / multimodal
    "vec_cosine_topk" -> Declared(VectorOps.vecCosineTopk _, VectorOps.vecCosineTopkSql),
    "vec_topk_batch" -> Declared(VectorOps.vecTopkBatch _, VectorOps.vecTopkBatchSql),
    "vec_sim_join_blocked" -> Declared(VectorOps.vecSimJoinBlocked _, VectorOps.vecSimJoinBlockedSql),
    "dedup_embedding_neardup" -> Declared(VectorOps.dedupEmbeddingNeardup _, VectorOps.dedupEmbeddingNeardupSql),
    "dedup_embedding_semantic" -> Declared(VectorOps.dedupEmbeddingSemantic _, VectorOps.dedupEmbeddingSemanticSql),
    "vec_centroid_by_label" -> Declared(VectorOps.vecCentroidByLabel _, VectorOps.vecCentroidByLabelSql),
    "vec_cluster_assign" -> Declared(VectorOps.vecClusterAssign _, VectorOps.vecClusterAssignSql),
    "ann_cosine_lsh" -> Declared(VectorOps.annCosineLsh _, None),
    "ann_cosine_ivf" -> Declared(VectorOps.annCosineIvf _, None),
    // rows-only by design: PQ candidates depend on trained codebooks
    // (AnnSpec pins recall + kernel contracts)
    "ann_cosine_pq" -> Declared(VectorOps.annCosinePq _, None),
    // rows-only by design: composed IVF-PQ (cells prune, codes compress,
    // exact re-rank) — AnnSpec pins recall vs IVF at equal byte budget
    "ann_cosine_ivfpq" -> Declared(VectorOps.annCosineIvfPq _, None),
    "mm_decode_features" -> Declared(VectorOps.mmDecodeFeatures _, VectorOps.mmDecodeFeaturesSql),
    "mm_decode_audio" -> Declared(VectorOps.mmDecodeAudio _, VectorOps.mmDecodeAudioSql),
    "mm_decode_video" -> Declared(VectorOps.mmDecodeVideo _, VectorOps.mmDecodeVideoSql),
    // §2.9 training-set preparation (round 10)
    "sample_stratified" -> Declared(TrainPrep.sampleStratified _, TrainPrep.sampleStratifiedSql),
    "sample_group_fixedk" -> Declared(TrainPrep.sampleGroupFixedK _, TrainPrep.sampleGroupFixedKSql),
    "split_train_eval" -> Declared(TrainPrep.splitTrainEval _, TrainPrep.splitTrainEvalSql),
    "mix_weighted" -> Declared(TrainPrep.mixWeighted _, TrainPrep.mixWeightedSql),
    "pack_sequences" -> Declared(TrainPrep.packSequences _, TrainPrep.packSequencesSql),
    // round 17: the packing layout under the BPE merge-table budget —
    // the context-window math made vocabulary-true
    "pack_sequences_bpe" -> Declared(TrainPrep.packSequencesBpe _, TrainPrep.packSequencesBpeSql),
    "dedup_lines_global" -> Declared(TrainPrep.dedupLinesGlobal _, TrainPrep.dedupLinesGlobalSql),
    "text_tfidf_topterms" -> Declared(TrainPrep.textTfidfTopterms _, TrainPrep.textTfidfToptermsSql),
    // same oracle on purpose: the token-table plan must be layout-blind
    "text_tfidf_table" -> Declared(TrainPrep.textTfidfTable _, TrainPrep.textTfidfToptermsSql),
    "text_bm25_table" -> Declared(TrainPrep.textBm25Table _, TrainPrep.textBm25TopkSql),
    "dq_constraint_report" -> Declared(TrainPrep.dqConstraintReport _, TrainPrep.dqConstraintReportSql),
    "agg_distinct_twolevel" -> Declared(TrainPrep.aggDistinctTwolevel _, TrainPrep.aggDistinctTwolevelSql),
    // §2.9 event-sequence analytics (round 11)
    "funnel_conversion" -> Declared(EventAnalytics.funnelConversion _, EventAnalytics.funnelConversionSql),
    "cohort_retention" -> Declared(EventAnalytics.cohortRetention _, EventAnalytics.cohortRetentionSql),
    "covisit_item_pairs" -> Declared(EventAnalytics.covisitItemPairs _, EventAnalytics.covisitItemPairsSql),
    "agg_incremental_refresh" -> Declared(Aggregations.aggIncrementalRefresh _, Aggregations.aggIncrementalRefreshSql),
    "feature_scale_standard" -> Declared(TrainPrep.featureScaleStandard _, TrainPrep.featureScaleStandardSql),
    "window_rolling_std" -> Declared(Windows.windowRollingStd _, Windows.windowRollingStdSql),
    "graph_pagerank" -> Declared(GraphOps.graphPagerank _, GraphOps.graphPagerankSql),
    "graph_triangles" -> Declared(GraphOps.graphTriangles _, GraphOps.graphTrianglesSql),
    // round 12: CDC, weighted order statistics, node similarity, BFS
    "snapshot_diff" -> Declared(Joins.snapshotDiff _, Joins.snapshotDiffSql),
    "agg_weighted_median" -> Declared(Aggregations.aggWeightedMedian _, Aggregations.aggWeightedMedianSql),
    "graph_jaccard_neighbors" -> Declared(GraphOps.graphJaccardNeighbors _, GraphOps.graphJaccardNeighborsSql),
    "graph_bfs_levels" -> Declared(GraphOps.graphBfsLevels _, GraphOps.graphBfsLevelsSql),
    "join_fuzzy_jaro" -> Declared(Joins.joinFuzzyJaro _, Joins.joinFuzzyJaroSql),
    // round 13: weighted order statistics at arbitrary q; RAG chunking
    "agg_weighted_quantile" -> Declared(Aggregations.aggWeightedQuantile _, Aggregations.aggWeightedQuantileSql),
    "chunk_overlap_windows" -> Declared(TrainPrep.chunkOverlapWindows _, TrainPrep.chunkOverlapWindowsSql),
    // round 13: exact duplicate-span (8-token window) removal — the
    // token-level substring-dedup discipline, relationally distributed
    "dedup_span_ngram" -> Declared(TrainPrep.dedupSpanNgram _, TrainPrep.dedupSpanNgramSql),
    // round 13: CDC log apply — inverse of snapshot_diff
    "merge_cdc_apply" -> Declared(Joins.mergeCdcApply _, Joins.mergeCdcApplySql),
    // round 13: feature-store point-in-time read; privacy/fold prep;
    // additive schema evolution
    "join_pit_features" -> Declared(Joins.joinPitFeatures _, Joins.joinPitFeaturesSql),
    "dq_k_anonymity" -> Declared(TrainPrep.dqKAnonymity _, TrainPrep.dqKAnonymitySql),
    "sample_kfold" -> Declared(TrainPrep.sampleKfold _, TrainPrep.sampleKfoldSql),
    "scan_schema_evolution" -> Declared(Scans.scanSchemaEvolution _, Scans.scanSchemaEvolutionSql),
    // round 13: marketing attribution; mixture class-balance report
    "event_attribution" -> Declared(EventAnalytics.eventAttribution _, EventAnalytics.eventAttributionSql),
    "dq_label_balance" -> Declared(TrainPrep.dqLabelBalance _, TrainPrep.dqLabelBalanceSql),
    // round 13: incremental JOIN-view maintenance (delta rule)
    "view_join_delta" -> Declared(Joins.viewJoinDelta _, Joins.viewJoinDeltaSql),
    // round 13: pandas merge_ordered (ordered union + group-wise ffill)
    "join_merge_ordered" -> Declared(Joins.joinMergeOrdered _, Joins.joinMergeOrderedSql),
    "join_combine_first" -> Declared(Joins.joinCombineFirst _, Joins.joinCombineFirstSql),
    "join_update_overlay" -> Declared(Joins.joinUpdateOverlay _, Joins.joinUpdateOverlaySql),
    // round 13: smoothed target encoding; IQR outlier gate
    "encode_target_mean" -> Declared(TrainPrep.encodeTargetMean _, TrainPrep.encodeTargetMeanSql),
    "dq_outlier_iqr" -> Declared(TrainPrep.dqOutlierIqr _, TrainPrep.dqOutlierIqrSql),
    // round 13: the fourth iterative graph shape — k-core peeling
    "graph_kcore_peel" -> Declared(GraphOps.graphKcorePeel _, GraphOps.graphKcorePeelSql),
    // round 14: weighted rolling mean; step-function time-weighted avg
    "window_rolling_wma" -> Declared(Windows.windowRollingWma _, Windows.windowRollingWmaSql),
    "ts_time_weighted_avg" -> Declared(Windows.tsTimeWeightedAvg _, Windows.tsTimeWeightedAvgSql),
    // round 14: label factorize; groupby idxmax
    "encode_label_factorize" -> Declared(TrainPrep.encodeLabelFactorize _, TrainPrep.encodeLabelFactorizeSql),
    "agg_idxmax" -> Declared(Aggregations.aggIdxmax _, Aggregations.aggIdxmaxSql),
    // round 14: distributed k-means fit; fuzzy entity resolution e2e
    "vec_kmeans_lloyd" -> Declared(VectorOps.vecKmeansLloyd _, VectorOps.vecKmeansLloydSql),
    "er_fuzzy_entities" -> Declared(Joins.erFuzzyEntities _, Joins.erFuzzyEntitiesSql),
    // round 14: per-group OLS; BM25 lexical top-k; join-key skew profile
    "agg_group_ols" -> Declared(Aggregations.aggGroupOls _, Aggregations.aggGroupOlsSql),
    "text_bm25_topk" -> Declared(TrainPrep.textBm25Topk _, TrainPrep.textBm25TopkSql),
    "dq_skew_profile" -> Declared(TrainPrep.dqSkewProfile _, TrainPrep.dqSkewProfileSql),
    // round 14: third exact co-moment member; per-key autocorrelation;
    // OHLC resample off one packed struct min/max
    "window_rolling_skew" -> Declared(Windows.windowRollingSkew _, Windows.windowRollingSkewSql),
    // round 15: rolling kurtosis completes the rolling-moment family
    "window_rolling_kurt" -> Declared(Windows.windowRollingKurt _, Windows.windowRollingKurtSql),
    "window_autocorr" -> Declared(Windows.windowAutocorrLag1 _, Windows.windowAutocorrLag1Sql),
    "ts_resample_ohlc" -> Declared(Windows.tsResampleOhlc _, Windows.tsResampleOhlcSql),
    // round 14: winsorize report; quantile-uniform feature encode
    "transform_winsorize" -> Declared(TrainPrep.transformWinsorize _, TrainPrep.transformWinsorizeSql),
    "encode_quantile_uniform" -> Declared(TrainPrep.encodeQuantileUniform _, TrainPrep.encodeQuantileUniformSql),
    // round 14: 3-sigma rolling gate; SCD-2 read path; anti-entropy
    // checksum diff; FK orphan audit
    "window_rolling_zscore" -> Declared(Windows.windowRollingZscore _, Windows.windowRollingZscoreSql),
    "join_scd2_lookup" -> Declared(Joins.joinScd2Lookup _, Joins.joinScd2LookupSql),
    "dq_table_checksum" -> Declared(TrainPrep.dqTableChecksum _, TrainPrep.dqTableChecksumSql),
    "dq_ref_integrity" -> Declared(TrainPrep.dqRefIntegrity _, TrainPrep.dqRefIntegritySql),
    // round 14: aggregate maintenance under I/U/D (signed contributions)
    "agg_refresh_cdc" -> Declared(Aggregations.aggRefreshCdc _, Aggregations.aggRefreshCdcSql),
    // round 14: groupby().nth(k); nested doc-assembly export
    "agg_group_nth" -> Declared(SortSetOps.groupbyNth _, SortSetOps.groupbyNthSql),
    "denorm_order_lines" -> Declared(SortSetOps.denormOrderLines _, SortSetOps.denormOrderLinesSql),
    // round 14: exchange-free co-located fact join (bucketed layout)
    "join_bucketed_facts" -> Declared(Joins.joinBucketedFacts _, Joins.joinBucketedFactsSql),
    // round 14: pandas groupby().filter(group predicate)
    "agg_group_filter" -> Declared(Aggregations.aggGroupFilter _, Aggregations.aggGroupFilterSql),
    // round 14: rolling min/max completes the rolling family
    "window_rolling_minmax" -> Declared(Windows.windowRollingMinmax _, Windows.windowRollingMinmaxSql),
    "window_rolling_minmax_wide" -> Declared(Windows.windowRollingMinmaxWide _, Windows.windowRollingMinmaxWideSql),
    // round 14: keep='last' dedup; symmetric set difference
    "dedup_keep_last" -> Declared(Windows.dedupKeepLast _, Windows.dedupKeepLastSql),
    "setop_symmetric_diff" -> Declared(SortSetOps.setopSymmetricDiff _, SortSetOps.setopSymmetricDiffSql),
    // round 15: rolling order statistic at general q; drawdown curve;
    // inter-arrival cadence profile; duplicated() flag twin
    "window_rolling_quantile" -> Declared(Windows.windowRollingQuantile _, Windows.windowRollingQuantileSql),
    "window_drawdown" -> Declared(Windows.windowDrawdown _, Windows.windowDrawdownSql),
    "ts_gap_stats" -> Declared(Windows.tsGapStats _, Windows.tsGapStatsSql),
    "dedup_flag_duplicates" -> Declared(Windows.dedupFlagDuplicates _, Windows.dedupFlagDuplicatesSql),
    // round 16: Dask map_overlap parity — boundary-stitched per-partition
    // UDF, oracled against the plain windowed form
    "window_rolling_map_overlap" -> Declared(Windows.windowRollingMapOverlap _, Windows.windowRollingMapOverlapSql),
    // round 15: distribution-shape aggregates (entropy/HHI, Gini, MAD)
    "agg_entropy" -> Declared(Aggregations.aggEntropy _, Aggregations.aggEntropySql),
    "agg_gini" -> Declared(Aggregations.aggGini _, Aggregations.aggGiniSql),
    "agg_mad" -> Declared(Aggregations.aggMad _, Aggregations.aggMadSql),
    // round 15: str.extract; corpus novelty curve; Zipf diagnostic
    "text_regex_extract" -> Declared(TextOps.textRegexExtract _, TextOps.textRegexExtractSql),
    "text_ngram_novelty" -> Declared(TextOps.textNgramNovelty _, TextOps.textNgramNoveltySql),
    "text_zipf_slope" -> Declared(TextOps.textZipfSlope _, TextOps.textZipfSlopeSql),
    // round 15: merge_asof on a numeric (price) axis
    "join_asof_numeric" -> Declared(Joins.joinAsofNumeric _, Joins.joinAsofNumericSql),
    // round 15 batch 2: expanding std; normalized crosstab; pivot with
    // margins; deterministic weighted sampling; completeness profile;
    // graph degree histogram
    "window_expanding_std" -> Declared(Windows.windowExpandingStd _, Windows.windowExpandingStdSql),
    "agg_crosstab_pct" -> Declared(Aggregations.aggCrosstabPct _, Aggregations.aggCrosstabPctSql),
    "agg_pivot_margins" -> Declared(Aggregations.aggPivotMargins _, Aggregations.aggPivotMarginsSql),
    "sample_weighted" -> Declared(TrainPrep.sampleWeighted _, TrainPrep.sampleWeightedSql),
    "dq_completeness" -> Declared(TrainPrep.dqCompleteness _, TrainPrep.dqCompletenessSql),
    "graph_degree_distribution" -> Declared(GraphOps.graphDegreeDistribution _, GraphOps.graphDegreeDistributionSql),
    // round 15 batch 3: rolling covariance; temperature-scaled mixture
    "window_rolling_cov" -> Declared(Windows.windowRollingCov _, Windows.windowRollingCovSql),
    "mix_temperature_weights" -> Declared(TrainPrep.mixTemperatureWeights _, TrainPrep.mixTemperatureWeightsSql),
    // round 15 batch 4: rolling prod/rank/nunique (the lag-unroll
    // members of the rolling family); between_time; groupby corrwith;
    // RFM segmentation; association rules; RRF hybrid retrieval;
    // resource-allocation link prediction
    "window_rolling_prod" -> Declared(Windows.windowRollingProd _, Windows.windowRollingProdSql),
    "window_rolling_rank" -> Declared(Windows.windowRollingRank _, Windows.windowRollingRankSql),
    "window_rolling_nunique" -> Declared(Windows.windowRollingNunique _, Windows.windowRollingNuniqueSql),
    "ts_between_time" -> Declared(Windows.tsBetweenTime _, Windows.tsBetweenTimeSql),
    "agg_corrwith" -> Declared(Aggregations.aggCorrwith _, Aggregations.aggCorrwithSql),
    "seg_rfm" -> Declared(EventAnalytics.segRfm _, EventAnalytics.segRfmSql),
    "assoc_rules_lift" -> Declared(EventAnalytics.assocRulesLift _, EventAnalytics.assocRulesLiftSql),
    "rag_fusion_rrf" -> Declared(VectorOps.ragFusionRrf _, VectorOps.ragFusionRrfSql),
    "graph_resource_alloc" -> Declared(GraphOps.graphResourceAlloc _, GraphOps.graphResourceAllocSql),
    // round 17: the deterministic 1/8-endpoint-sample RA gate — same
    // machinery, 64x smaller pair domain, so the cross-engine hash
    // check extends past sf0.1 where the full oracle spills the box
    "graph_ra_sampled" -> Declared(GraphOps.graphRaSampled _, GraphOps.graphRaSampledSql),
    // round 15 batch 5: calendar-aligned day-over-day change; expanding
    // corr; ewm variance; snapshot column-profile drift
    "ts_dod_change" -> Declared(Windows.tsDodChange _, Windows.tsDodChangeSql),
    "window_expanding_corr" -> Declared(Windows.windowExpandingCorr _, Windows.windowExpandingCorrSql),
    "window_ewm_var" -> Declared(Windows.windowEwmVar _, Windows.windowEwmVarSql),
    // round 17: the size-ceiling-free routing variant, oracle-locked
    // with the SAME SQL — at fixture scale every key is inside the
    // lattice horizon, so routing correctness (short keys bit-identical
    // to the lattice) is what the hash gate checks; the long branch is
    // spec-gated (Round17Spec's planted 200-row ceiling key)
    "window_ewm_var_auto" -> Declared(Windows.windowEwmVarAuto _, Windows.windowEwmVarSql),
    "dq_schema_drift" -> Declared(TrainPrep.dqSchemaDrift _, TrainPrep.dqSchemaDriftSql),
    // round 15 batch 6: rolling idxmax (packed-key argmax); seasonal
    // z-score anomalies; weighted group mean; capped ordered string agg
    "window_rolling_idxmax" -> Declared(Windows.windowRollingIdxmax _, Windows.windowRollingIdxmaxSql),
    "ts_seasonal_anomaly" -> Declared(Windows.tsSeasonalAnomaly _, Windows.tsSeasonalAnomalySql),
    "agg_weighted_mean" -> Declared(Aggregations.aggWeightedMean _, Aggregations.aggWeightedMeanSql),
    "agg_string_join" -> Declared(Aggregations.aggStringJoin _, Aggregations.aggStringJoinSql),
    // round 15 batch 7: Spark-4 VARIANT semi-structured path; pandas
    // axis=1 row-wise statistics
    "scalar_variant" -> Declared(Scalars.scalarVariant _, Scalars.scalarVariantSql),
    "scalar_rowwise_stats" -> Declared(Scalars.scalarRowwiseStats _, Scalars.scalarRowwiseStatsSql),
    // round 15 batch 8: experimentation statistics — Welch A/B t,
    // chi-square independence
    "agg_ab_ttest" -> Declared(Aggregations.aggAbTtest _, Aggregations.aggAbTtestSql),
    "agg_chisq_independence" -> Declared(Aggregations.aggChisqIndependence _, Aggregations.aggChisqIndependenceSql),
    // round 15 batch 9: token-budget epoch schedule (the step after
    // temperature weights in a pretraining mixture plan)
    "mix_epoch_schedule" -> Declared(TrainPrep.mixEpochSchedule _, TrainPrep.mixEpochScheduleSql),
    // round 15 batch 9 (cont.): one-way ANOVA F across event types
    "agg_anova_f" -> Declared(Aggregations.aggAnovaF _, Aggregations.aggAnovaFSql),
    // round 15 batch 10: additive seasonal decomposition on the
    // per-user daily grid
    "ts_seasonal_decompose" -> Declared(Windows.tsSeasonalDecompose _, Windows.tsSeasonalDecomposeSql),
    // round 15 batch 10 (cont.): CUSUM sequential change detection
    "ts_cusum_alarm" -> Declared(Windows.tsCusumAlarm _, Windows.tsCusumAlarmSql),
    // round 16: robust centers (rank-trimmed, reciprocal-lattice
    // harmonic) and the Benford first-digit audit on the cents lattice
    "agg_trimmed_mean" -> Declared(Aggregations.aggTrimmedMean _, Aggregations.aggTrimmedMeanSql),
    "agg_harmonic_mean" -> Declared(Aggregations.aggHarmonicMean _, Aggregations.aggHarmonicMeanSql),
    "dq_benford" -> Declared(TrainPrep.dqBenford _, TrainPrep.dqBenfordSql),
    // round 16: Spearman rho — Pearson over tie-averaged ranks, all
    // four rank windows sharing ONE group exchange
    "agg_spearman" -> Declared(Aggregations.aggSpearman _, Aggregations.aggSpearmanSql),
    // round 16: Holt linear-trend smoothing + 7-step forecast — the ts
    // family's first forecaster; both engines run the identical
    // sequential recursion (fold vs recursive CTE)
    "ts_holt_forecast" -> Declared(Windows.tsHoltForecast _, Windows.tsHoltForecastSql),
    // round 17: Holt-Winters additive seasonal (period 7) — the
    // triple-exponential completion; the recursive-CTE oracle carries
    // the seven seasonal slots as state columns
    "ts_hw_forecast" -> Declared(Windows.tsHwForecast _, Windows.tsHwForecastSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.aggBasic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Declared(_, Some(sql))) => k -> sql }
}
