package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** User-facing facade: session wiring + SQL-surface registration.
  *
  * A user of the reference system interacts through managed-service
  * query surfaces (Athena SQL over declared tables, README.md:269;
  * Kibana aggs). The equivalent here: [[registerTables]] exposes the
  * parquet tables as temp views (+ the UDx functions), after which
  * `spark.sql("SELECT ... FROM lineitem ...")` runs any of this
  * library's semantics through Catalyst.
  */
object Engine {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Recommended local-session defaults (mirrors the driver harness:
    * shuffle partitions sized to cores, AQE on, UTC).
    */
  def localSession(cores: Int = 4, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** EXP-5: flatten a map-typed orientation column into scalar columns —
    * the publish-time dict flatten (sensor_publish.py:59, 71-73),
    * expressed as `GetMapValue` projections.
    */
  def flattenOrientation(df: DataFrame, mapCol: String = "orientation"): DataFrame =
    df.select(df.columns.filterNot(_ == mapCol).map(col) ++
      Seq("pitch", "roll", "yaw").map(k => col(mapCol)(k).as(k)): _*)

  /** STR-7: rate-limited file-stream source — the shard/backpressure
    * analog (`maxFilesPerTrigger` caps per-micro-batch intake the way
    * shard counts cap Kinesis throughput, README.md:55-96).
    */
  def rateLimitedFileStream(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toLong)
      .json(path)

  /** Register all testdata tables as temp views + the UDx functions. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    graft.functions.Udx.register(spark)
  }
}
