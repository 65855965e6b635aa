package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{AdvancedQueries, EventQueries, ExtensionQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2's inventory
  * (ID encoded in the name); every SQL-expressible one has a matching
  * DuckDB oracle in [[oracleSql]] over the same parquet tables. Column
  * names/aliases are identical on both sides (the driver's compare hashes
  * by sorted column name).
  */
object SparkEntry {

  /** Flagship query (AGG-1 hourly average — the reference's headline Kibana
    * chart, README.md:134-150) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.hourlyAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg1_hourly_avg" -> (EventQueries.hourlyAvg _),
    "q_agg2_bucket_max" -> (EventQueries.bucketMax _),
    "q_agg3_corr" -> (EventQueries.corrByType _),
    "q_agg4_hourly_counts" -> (EventQueries.hourlyCounts _),
    "q_exp34_json_roundtrip" -> (EventQueries.jsonRoundtrip _),
    "q_src4_rule_filter" -> (EventQueries.ruleFilter _),
    "q_dd1_dedup_exact" -> (EventQueries.dedupExact _),
    "q_dd2_dedup_latest" -> (EventQueries.dedupLatest _),
    "q_cmp1_roundtrip" -> (EventQueries.compactionRoundtrip _),
    "q_rel1_scan_filter" -> (RelationalQueries.scanFilter _),
    "q_rel4_join_broadcast" -> (RelationalQueries.joinBroadcast _),
    "q_rel5_join_large" -> (RelationalQueries.joinLarge _),
    "q_rel6_join_outer" -> (RelationalQueries.joinOuter _),
    "q_rel7_join_semi_anti" -> (RelationalQueries.joinSemiAnti _),
    "q_rel8_join_theta" -> (RelationalQueries.joinTheta _),
    "q_rel9_pricing_summary" -> (RelationalQueries.pricingSummary _),
    "q_rel10_distinct" -> (RelationalQueries.distinctCounts _),
    "q_rel10b_approx_distinct" -> (RelationalQueries.approxDistinct _),
    "q_rel10c_quantile_stats" -> (RelationalQueries.quantileStats _),
    "q_rel11_rollup" -> (RelationalQueries.rollupAgg _),
    "q_rel11b_cube" -> (RelationalQueries.cubeAgg _),
    "q_rel24_scalar_subquery" -> (RelationalQueries.scalarSubquery _),
    "q_rel12_window_rank" -> (RelationalQueries.windowRank _),
    "q_rel13_window_frames" -> (RelationalQueries.windowFrames _),
    "q_rel14_topk" -> (RelationalQueries.topK _),
    "q_rel15_setops" -> (RelationalQueries.setOps _),
    "q_rel16_string_funcs" -> (RelationalQueries.stringFuncs _),
    "q_rel17_date_funcs" -> (RelationalQueries.dateFuncs _),
    "q_rel18_math_funcs" -> (RelationalQueries.mathFuncs _),
    "q_rel19_array_funcs" -> (RelationalQueries.arrayFuncs _),
    "q_rel20_json_funcs" -> (RelationalQueries.jsonFuncs _),
    "q_rel21_conditional" -> (RelationalQueries.conditional _),
    "q_rel22_pivot" -> (RelationalQueries.pivotCounts _),
    "q_rel23_unpivot" -> (RelationalQueries.unpivotMetrics _),
    "q_txt1_wordcount" -> (ExtensionQueries.wordCount _),
    "q_txt2_text_stats" -> (ExtensionQueries.textStats _),
    "q_txt3_lang_id" -> (ExtensionQueries.langId _),
    "q_txt4_quality_score" -> (ExtensionQueries.qualityScore _),
    "q_txt5_token_counts" -> (ExtensionQueries.tokenCounts _),
    "q_txt6_fingerprints" -> (ExtensionQueries.fingerprints _),
    "q_dd3_doc_dedup_exact" -> (ExtensionQueries.docDedupExact _),
    "q_dd4_ngram_jaccard" -> (ExtensionQueries.ngramJaccard _),
    "q_dd5_minhash_lsh" -> (ExtensionQueries.minhashDedup _),
    "q_dd6_simhash" -> (ExtensionQueries.simhashDedup _),
    "q_dd6b_simhash_blocked" -> (ExtensionQueries.simhashBlockedDedup _),
    "q_dd7_embedding_neardup" -> (ExtensionQueries.embeddingNearDup _),
    "q_sim1_cosine_topk" -> (ExtensionQueries.cosineTopK _),
    "q_sim2_ann_lsh" -> (ExtensionQueries.annTopK _),
    "q_sim3_ivf" -> (ExtensionQueries.ivfTopK _),
    "q_mm1_binary_meta" -> (ExtensionQueries.binaryMeta _),
    "q_mm2_frame_stats" -> (ExtensionQueries.frameStats _),
    "q_txt7_redaction" -> (ExtensionQueries.redaction _),
    "q_txt8_boilerplate" -> (ExtensionQueries.boilerplate _),
    "q_txt9_repetition" -> (ExtensionQueries.repetitionFilter _),
    "q_ml1_split_stats" -> (ExtensionQueries.splitStats _),
    "q_ml2_contamination" -> (ExtensionQueries.contamination _),
    "q_ml3_stratified_sample" -> (ExtensionQueries.stratifiedSample _),
    "q_ml4_label_balance" -> (ExtensionQueries.labelBalance _),
    "q_rel25_having" -> (RelationalQueries.havingAgg _),
    "q_rel26_ntile_pctrank" -> (RelationalQueries.ntilePctRank _),
    "q_adv1_shipping_priority" -> (AdvancedQueries.shippingPriority _),
    "q_adv2_local_supplier_volume" -> (AdvancedQueries.localSupplierVolume _),
    "q_adv3_salted_agg" -> (AdvancedQueries.saltedAgg(_, _)),
    "q_adv4_session_windows" -> (AdvancedQueries.sessionWindows _),
    "q_adv5_asof_join" -> (AdvancedQueries.asOfJoin _),
    "q_adv5b_asof_tolerance" -> (AdvancedQueries.asOfJoinTolerance _),
    "q_adv6_range_join" -> (AdvancedQueries.rangeJoin _),
    "q_rel11c_grouping_sets" -> (RelationalQueries.groupingSets _),
    "q_rel13b_range_frames" -> (RelationalQueries.rangeFrames _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg1_hourly_avg" -> EventQueries.hourlyAvgSql,
    "q_agg2_bucket_max" -> EventQueries.bucketMaxSql,
    "q_agg3_corr" -> EventQueries.corrByTypeSql,
    "q_agg4_hourly_counts" -> EventQueries.hourlyCountsSql,
    "q_exp34_json_roundtrip" -> EventQueries.jsonRoundtripSql,
    "q_src4_rule_filter" -> EventQueries.ruleFilterSql,
    "q_dd1_dedup_exact" -> EventQueries.dedupExactSql,
    "q_dd2_dedup_latest" -> EventQueries.dedupLatestSql,
    "q_cmp1_roundtrip" -> EventQueries.compactionRoundtripSql,
    "q_rel1_scan_filter" -> RelationalQueries.scanFilterSql,
    "q_rel4_join_broadcast" -> RelationalQueries.joinBroadcastSql,
    "q_rel5_join_large" -> RelationalQueries.joinLargeSql,
    "q_rel6_join_outer" -> RelationalQueries.joinOuterSql,
    "q_rel7_join_semi_anti" -> RelationalQueries.joinSemiAntiSql,
    "q_rel8_join_theta" -> RelationalQueries.joinThetaSql,
    "q_rel9_pricing_summary" -> RelationalQueries.pricingSummarySql,
    "q_rel10_distinct" -> RelationalQueries.distinctCountsSql,
    // q_rel10b_approx_distinct: HLL sketch — no DuckDB equivalent; rows-only.
    "q_rel10c_quantile_stats" -> RelationalQueries.quantileStatsSql,
    "q_rel11_rollup" -> RelationalQueries.rollupAggSql,
    "q_rel11b_cube" -> RelationalQueries.cubeAggSql,
    "q_rel24_scalar_subquery" -> RelationalQueries.scalarSubquerySql,
    "q_rel12_window_rank" -> RelationalQueries.windowRankSql,
    "q_rel13_window_frames" -> RelationalQueries.windowFramesSql,
    "q_rel14_topk" -> RelationalQueries.topKSql,
    "q_rel15_setops" -> RelationalQueries.setOpsSql,
    "q_rel16_string_funcs" -> RelationalQueries.stringFuncsSql,
    "q_rel17_date_funcs" -> RelationalQueries.dateFuncsSql,
    "q_rel18_math_funcs" -> RelationalQueries.mathFuncsSql,
    "q_rel19_array_funcs" -> RelationalQueries.arrayFuncsSql,
    "q_rel20_json_funcs" -> RelationalQueries.jsonFuncsSql,
    "q_rel21_conditional" -> RelationalQueries.conditionalSql,
    "q_rel22_pivot" -> RelationalQueries.pivotCountsSql,
    "q_rel23_unpivot" -> RelationalQueries.unpivotMetricsSql,
    "q_txt1_wordcount" -> ExtensionQueries.wordCountSql,
    "q_txt2_text_stats" -> ExtensionQueries.textStatsSql,
    "q_txt3_lang_id" -> ExtensionQueries.langIdSql,
    "q_txt4_quality_score" -> ExtensionQueries.qualityScoreSql,
    "q_txt5_token_counts" -> ExtensionQueries.tokenCountsSql,
    "q_txt6_fingerprints" -> ExtensionQueries.fingerprintsSql,
    "q_dd3_doc_dedup_exact" -> ExtensionQueries.docDedupExactSql,
    "q_dd4_ngram_jaccard" -> ExtensionQueries.ngramJaccardSql,
    "q_dd5_minhash_lsh" -> ExtensionQueries.minhashDedupSql,
    "q_dd6_simhash" -> ExtensionQueries.simhashDedupSql,
    "q_dd6b_simhash_blocked" -> ExtensionQueries.simhashBlockedDedupSql,
    "q_dd7_embedding_neardup" -> ExtensionQueries.embeddingNearDupSql,
    "q_sim1_cosine_topk" -> ExtensionQueries.cosineTopKSql,
    "q_sim2_ann_lsh" -> ExtensionQueries.annTopKSql,
    "q_sim3_ivf" -> ExtensionQueries.ivfTopKSql,
    "q_mm1_binary_meta" -> ExtensionQueries.binaryMetaSql,
    "q_mm2_frame_stats" -> ExtensionQueries.frameStatsSql,
    "q_txt7_redaction" -> ExtensionQueries.redactionSql,
    "q_txt8_boilerplate" -> ExtensionQueries.boilerplateSql,
    "q_txt9_repetition" -> ExtensionQueries.repetitionFilterSql,
    "q_ml1_split_stats" -> ExtensionQueries.splitStatsSql,
    "q_ml2_contamination" -> ExtensionQueries.contaminationSql,
    "q_ml3_stratified_sample" -> ExtensionQueries.stratifiedSampleSql,
    "q_ml4_label_balance" -> ExtensionQueries.labelBalanceSql,
    "q_rel25_having" -> RelationalQueries.havingAggSql,
    "q_rel26_ntile_pctrank" -> RelationalQueries.ntilePctRankSql,
    "q_adv1_shipping_priority" -> AdvancedQueries.shippingPrioritySql,
    "q_adv2_local_supplier_volume" -> AdvancedQueries.localSupplierVolumeSql,
    "q_adv3_salted_agg" -> AdvancedQueries.saltedAggSql,
    "q_adv4_session_windows" -> AdvancedQueries.sessionWindowsSql,
    "q_adv5_asof_join" -> AdvancedQueries.asOfJoinSql,
    "q_adv5b_asof_tolerance" -> AdvancedQueries.asOfJoinToleranceSql,
    "q_adv6_range_join" -> AdvancedQueries.rangeJoinSql,
    "q_rel11c_grouping_sets" -> RelationalQueries.groupingSetsSql,
    "q_rel13b_range_frames" -> RelationalQueries.rangeFramesSql)
}
