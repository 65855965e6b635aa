package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** The ES key is a pure function of the row, so the weighted stream
  * inherits the uniform stream's exactness: state ≡ the batch
  * operator over every distinct doc seen, after every batch, through
  * redelivery. Plus the family's replay/stale/(k, salt) discipline
  * and the engine-driven leg.
  */
class WeightedSampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 15

  // Deterministic text per id with varying token counts (1..9 words);
  // batch 2 re-delivers a slice of batch 0.
  private def text(i: Long): String =
    (0 to (i % 9).toInt).map(j => s"t${(i + j) % 13}").mkString(" ")
  private def slices: Seq[Seq[(Long, String)]] = {
    val all = (0L until 240L).map(i => (i, text(i)))
    Seq(all.slice(0, 80), all.slice(80, 160),
      all.slice(160, 240) ++ all.slice(0, 40))
  }

  private def docs(s: Seq[(Long, String)]) = s.toDF("doc_id", "text")

  private def batchReference(seen: Seq[Long]) =
    Sampling.weightedBottomK(
        docs(seen.map(i => (i, text(i))))
          .withColumn("w", graft.functions.TextFunctions.tokenCount(col("text"))),
        "doc_id", "w", K)
      .orderBy("wr_rn")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq

  private def stateRows(dir: String): Seq[(Long, Double)] =
    WeightedSampleStream.sample(spark, dir).orderBy("rnk", "key")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq

  test("state equals the batch ES sample of distinct docs seen, after every batch") {
    val dir = Files.createTempDirectory("graft-wsmpstream").toString
    val fn = WeightedSampleStream.pipeline(dir, K)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(docs(s), i.toLong)
      val seen = slices.take(i + 1).flatten.map(_._1).distinct
      assert(stateRows(dir) == batchReference(seen), s"after batch $i")
    }
  }

  test("replay no-op; stale and mismatched (k, salt) refuse") {
    val dir = Files.createTempDirectory("graft-wsmpreplay").toString
    val fn = WeightedSampleStream.pipeline(dir, K)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = stateRows(dir)
    val metaBefore = WeightedSampleStream.readMeta(spark, dir)
    fn(docs(slices.last), (slices.size - 1).toLong)
    assert(stateRows(dir) == before)
    assert(WeightedSampleStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(docs(slices.head), 0L) }
    intercept[IllegalStateException] {
      WeightedSampleStream.pipeline(dir, K + 1)(docs(slices.head), 3L)
    }
    intercept[IllegalStateException] {
      WeightedSampleStream.pipeline(dir, K, salt = "other")(docs(slices.head), 3L)
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the batch sample") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-wsmpengine").toString
    val fn = WeightedSampleStream.pipeline(dir, K)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val seen = slices.flatten.map(_._1).distinct
    assert(stateRows(dir) == batchReference(seen))
  }

  test("foreign metaless state fails loudly") {
    val dir = Files.createTempDirectory("graft-wsmpforeign").toString
    Seq((1L, "x", 2L, 0.5)).toDF("key", "text", "w", "rnk")
      .write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] {
      WeightedSampleStream.readMeta(spark, dir)
    }
  }
}
