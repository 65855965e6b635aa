package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.EventQueries

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
    "q_dd2_dedup_latest" -> (EventQueries.dedupLatest _))

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
    "q_dd2_dedup_latest" -> EventQueries.dedupLatestSql)
}
