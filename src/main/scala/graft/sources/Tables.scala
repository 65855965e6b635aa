package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`; schemas in /root/repo/FIXTURES.md §2).
  *
  * All reads are plain `spark.read.parquet` so Catalyst's vectorized
  * reader, filter pushdown, and column pruning apply — at 100 TB the scan
  * must only materialize the pruned columns/row-groups, which requires the
  * filters/projections to stay declarative above these loaders.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` is the sensor-stream analog (FIXTURES.md: ts/value/event_id/
    * user_id ≅ timestamp/temperature/count/client_id).
    *
    * The parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it as a raw
    * nanosecond epoch long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * expose BOTH representations:
    *   - `ts_ns`: exact int64 nanoseconds (lossless; use for ordering and
    *     for oracle-comparable output via DuckDB's `epoch_ns`),
    *   - `ts`: TimestampType truncated to microseconds (Spark's native
    *     precision; use for time bucketing — `date_trunc`, `window`).
    * The truncation uses integer `div`, not double division: epoch-ns
    * values (~1.7e18) exceed a double's 53-bit mantissa.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
