package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.operators.Similarity
import graft.schema.SensorReading
import graft.streaming.SensorPipeline

/** Cross-module integration: the seams the unit specs don't cover. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def reading(ts: String, count: Long, temp: Double): SensorReading =
    SensorReading("raspberrypi", Timestamp.valueOf(ts), 50.0, temp, 1012.0,
      0.0, 0.0, 0.0, count)

  test("STR-1 Kappa law: batch aggregation over the streamed sink equals direct aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      reading("2022-07-14 15:00:00", 1, 30.0),
      reading("2022-07-14 15:30:00", 2, 34.0),
      reading("2022-07-14 16:10:00", 3, 40.0),
      reading("2022-07-14 16:20:00", 4, 42.0))
    val mem = MemoryStream[SensorReading]
    mem.addData(rows: _*)
    val out = Files.createTempDirectory("graft-kappa")
    val cp = Files.createTempDirectory("graft-kappa-cp")
    val q = SensorPipeline.hourlyPartitionedWriter(mem.toDF(), out.toString, cp.toString).start()
    q.awaitTermination(60000); q.stop()

    // The batch view IS the streamed sink (no second pipeline):
    val batchView = spark.read.parquet(out.toString)
      .groupBy(col("hour")).agg(avg("temperature").as("avg_t"), count(lit(1)).as("n"))
    val direct = rows.toDF()
      .groupBy(date_format(col("timestamp"), "yyyy-MM-dd-HH").as("hour"))
      .agg(avg("temperature").as("avg_t"), count(lit(1)).as("n"))
    val a = batchView.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val b = direct.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, s"stream-then-batch $a != direct $b")
    assert(a.map(_._1).toSeq == Seq("2022-07-14-15", "2022-07-14-16"))
  }

  test("multimodal chain: stubbed media features feed similarity search") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // same bytes → same features
      (2L, "totally different words in this doc x"),
      (3L, "yet another unrelated document body y"))
      .toDF("doc_id", "text")
    val feats = Multimodal.stubDecodeFeatures(
      Multimodal.attachPayload(docs).as[Multimodal.MediaRecord], dim = 8)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val q = feats.where(col("vec_id") === 0)
    val top = Similarity.bruteForceTopK(q, feats, k = 1).head()
    assert(top.getAs[Long]("neighbor_id") == 1L, "identical payload is the nearest neighbor")
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("driver contract: entry() returns rows; every query has a runnable entry") {
    assert(SparkEntry.entry(spark).count() > 0, "flagship must return rows")
    // Every oracleSql key must refer to a real query (a typo'd key would
    // silently drop that query from the driver's correctness gate).
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }
}
