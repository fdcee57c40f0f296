package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator is exposed here as a `(spark, sfDir) =>
  * DataFrame` plus (where portably expressible) a DuckDB oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A: reference-derived relational operators
    "q_window_dedup" -> (Staging.windowDedup _),
    "q_surrogate_key" -> (Staging.surrogateKeys _),
    "q_case_map" -> (Staging.caseMapDescriptions _),
    "q_stg_clean" -> (Staging.stgEvents _),
    "q_seed_dim" -> (Staging.seedDim _),
    "q_fact_join" -> (Facts.factLineitem _),
    "q_monthly_rollup" -> (Facts.monthlyRollup _),
    "q_monthly_stats" -> (Facts.monthlyStats _),
    "q_metric_timegrain" -> (Facts.metricMonthly _),
    "q_metric_grains" -> (Facts.metricYearly _),
    "q_metric_quarter" -> (Facts.metricQuarterly _),
    "q_check_unique" -> (Checks.checkUnique _),
    "q_check_not_null" -> (Checks.checkNotNull _),
    "q_check_relationships" -> (Checks.checkRelationships _),
    "q_check_accepted_values" -> (Checks.checkAcceptedValues _),
    // C: LLM-training-data pipeline operators
    "q_dedup_exact" -> (TextAnalysis.dedupExact _),
    "q_dedup_minhash" -> (Dedup.minhashLsh _),
    "q_dedup_simhash" -> (Dedup.simhash _),
    "q_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "q_dedup_embedding" -> (Dedup.embeddingNearDup _),
    "q_ann_topk" -> (Ann.annTopK _),
    "q_ann_lsh" -> (Ann.annLsh _),
    "q_ann_ivf" -> (Ann.annIvf _),
    "q_lang_id" -> (TextAnalysis.langId _),
    "q_quality_score" -> (TextAnalysis.qualityScore _),
    "q_token_count" -> (TextAnalysis.tokenCount _),
    "q_token_bpe" -> (TextAnalysis.tokenBpe _),
    "q_fingerprint" -> (TextAnalysis.fingerprint _),
    "q_winnow" -> (TextAnalysis.winnow _),
    "q_vocab" -> (TextAnalysis.vocab _),
    "q_vocab_approx" -> (TextAnalysis.vocabApprox _),
    "q_train_test_split" -> (TextAnalysis.trainTestSplit _),
    "q_chunk" -> (TextAnalysis.chunk _),
    "q_multimodal_meta" -> (Multimodal.multimodalMeta _),
    "q_multimodal_features" -> (Multimodal.multimodalFeatures _),
    // D: event-time operators (batch face; streaming face in tests)
    "q_hourly_events" -> (graft.streaming.Events.qHourlyEvents _),
    "q_sessionize" -> (graft.streaming.Events.qSessionize _),
    // E: additional relational surface
    "q_json_props" -> (Extras.jsonProps _),
    "q_running_total" -> (Extras.runningTotal _),
    "q_rollup" -> (Extras.regionRollup _),
    "q_distinct_counts" -> (Extras.distinctCounts _),
    "q_asof_join" -> (Extras.asofJoin _),
    "q_percentiles" -> (Extras.percentiles _),
    "q_approx_distinct" -> (Extras.approxDistinct _),
    "q_subqueries" -> (Extras.subqueries _),
    "q_pivot" -> (Extras.pivotServiceType _),
    "q_cube" -> (Extras.cubeRegionStatus _),
    "q_set_ops" -> (Extras.setOps _),
    "q_range_join" -> (Extras.rangeJoin _),
    "q_grouping_sets" -> (Extras.groupingSetsQ _),
    "q_window_funcs" -> (Extras.windowFuncs _),
    "q_semi_anti" -> (Extras.semiAnti _),
    "q_skew_agg" -> (Extras.skewSaltedTotals _),
    "q_incremental" -> (Extras.incrementalMerge _),
    "q_stratified_sample" -> (TextAnalysis.stratifiedSample _),
    "q_quality_filter" -> (TextAnalysis.qualityFilter _),
    "q_pii_scrub" -> (TextAnalysis.piiScrub _),
    "q_embed_norm" -> (Ann.embedNorm _),
    "q_embed_quantize" -> (Ann.embedQuantize _),
    "q_scd2" -> (Snapshot.qScd2 _),
    "q_profile" -> (Profile.profileNumeric _),
    "q_histogram" -> (Profile.histogram _),
    "q_dedup_clusters" -> (Dedup.dedupClusters _),
    // B: headline analytics
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_topk" -> (Analytics.q3TopK _),
    "q5_join5" -> (Analytics.q5Join5 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q_window_dedup" -> Staging.windowDedupSql,
    "q_surrogate_key" -> Staging.surrogateKeysSql,
    "q_case_map" -> Staging.caseMapDescriptionsSql,
    "q_stg_clean" -> Staging.stgEventsSql,
    "q_seed_dim" -> Staging.seedDimSql,
    "q_fact_join" -> Facts.factLineitemSql,
    "q_monthly_rollup" -> Facts.monthlyRollupSql,
    "q_monthly_stats" -> Facts.monthlyStatsSql,
    "q_metric_timegrain" -> Facts.metricMonthlySql,
    "q_metric_grains" -> Facts.metricYearlySql,
    "q_metric_quarter" -> Facts.metricQuarterlySql,
    "q_check_unique" -> Checks.checkUniqueSql,
    "q_check_not_null" -> Checks.checkNotNullSql,
    "q_check_relationships" -> Checks.checkRelationshipsSql,
    "q_check_accepted_values" -> Checks.checkAcceptedValuesSql,
    "q_dedup_exact" -> TextAnalysis.dedupExactSql,
    "q_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q_dedup_embedding" -> Dedup.embeddingNearDupSql,
    "q_ann_topk" -> Ann.annTopKSql,
    "q_lang_id" -> TextAnalysis.langIdSql,
    "q_quality_score" -> TextAnalysis.qualityScoreSql,
    "q_token_count" -> TextAnalysis.tokenCountSql,
    "q_fingerprint" -> TextAnalysis.fingerprintSql,
    "q_vocab" -> TextAnalysis.vocabSql,
    "q_train_test_split" -> TextAnalysis.trainTestSplitSql,
    "q_chunk" -> TextAnalysis.chunkSql,
    "q_multimodal_meta" -> Multimodal.multimodalMetaSql,
    "q_hourly_events" -> graft.streaming.Events.qHourlyEventsSql,
    "q_sessionize" -> graft.streaming.Events.qSessionizeSql,
    "q_json_props" -> Extras.jsonPropsSql,
    "q_running_total" -> Extras.runningTotalSql,
    "q_rollup" -> Extras.regionRollupSql,
    "q_distinct_counts" -> Extras.distinctCountsSql,
    "q_asof_join" -> Extras.asofJoinSql,
    "q_percentiles" -> Extras.percentilesSql,
    "q_token_bpe" -> TextAnalysis.tokenBpeSql,
    "q_subqueries" -> Extras.subqueriesSql,
    "q_pivot" -> Extras.pivotServiceTypeSql,
    "q_cube" -> Extras.cubeRegionStatusSql,
    "q_set_ops" -> Extras.setOpsSql,
    "q_range_join" -> Extras.rangeJoinSql,
    "q_grouping_sets" -> Extras.groupingSetsSql,
    "q_window_funcs" -> Extras.windowFuncsSql,
    "q_semi_anti" -> Extras.semiAntiSql,
    "q_skew_agg" -> Extras.skewSaltedTotalsSql,
    "q_incremental" -> Extras.incrementalMergeSql,
    "q_stratified_sample" -> TextAnalysis.stratifiedSampleSql,
    "q_quality_filter" -> TextAnalysis.qualityFilterSql,
    "q_pii_scrub" -> TextAnalysis.piiScrubSql,
    "q_embed_norm" -> Ann.embedNormSql,
    "q_embed_quantize" -> Ann.embedQuantizeSql,
    "q_scd2" -> Snapshot.qScd2Sql,
    "q_profile" -> Profile.profileNumericSql,
    "q_histogram" -> Profile.histogramSql,
    "q1_pricing" -> Analytics.q1PricingSql,
    "q3_topk" -> Analytics.q3TopKSql,
    "q5_join5" -> Analytics.q5Join5Sql,
  )
}
