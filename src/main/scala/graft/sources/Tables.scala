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
    * The loader normalizes BOTH physical layouts the driver has generated
    * to one logical schema, so every downstream query sees:
    *   - `ts_ns`: int64 epoch nanoseconds (use for total ordering and for
    *     oracle-comparable µs output via `ts_ns div 1000` ≡ DuckDB's
    *     `epoch_us(ts)`),
    *   - `ts`: TimestampType at Spark's native µs precision (use for time
    *     bucketing — `date_trunc`, `window`).
    *
    * Layouts seen: (a) TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]) — read as a raw nanosecond
    * epoch long via `spark.sql.legacy.parquet.nanosAsLong` (the conf is
    * inert when no nanos column is present) and truncate with integer
    * `div`, not double division (epoch-ns ~1.7e18 exceeds a double's
    * 53-bit mantissa); (b) plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ — cast to
    * TimestampType (naive ≡ instant under the project-wide UTC session
    * timezone, matching DuckDB's naive-as-UTC `epoch_us`) and derive the
    * nanosecond long from `unix_micros`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    def restore(): Unit = prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    spark.conf.set(key, "true")
    // Any failure before the nanos-layout case commits to keeping the
    // conf (missing/corrupt file, unexpected schema) must not leak the
    // toggle into the caller's session.
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // TIMESTAMP(NANOS) layout: the conf MUST stay set for the life
          // of any DataFrame derived from this read — the parquet reader
          // consults the session conf again at execution time, so a
          // set/restore scope here would fail every derived plan at task
          // launch. This is the one loader-persistent conf, and it is
          // inert for every other read (no other table has a nanos
          // column).
          raw.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        case _ => // TIMESTAMP_NTZ (or already-instant TIMESTAMP)
          // The conf was inert (no nanos column) — restore the caller's
          // session state rather than leak a global toggle from a loader.
          restore()
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      }
    } catch {
      case e: Throwable => restore(); throw e
    }
  }
}
