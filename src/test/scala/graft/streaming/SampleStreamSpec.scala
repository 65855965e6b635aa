package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Sampling

/** The bottom-k merge law makes the streamed sample EXACT: the state
  * after any prefix of batches equals the one-shot bottom-k of every
  * distinct doc seen. These tests pin that equality, redelivery
  * immunity (same doc ⇒ same rank ⇒ one survivor), replay/stale/salt
  * discipline, the engine-driven leg, and foreign-state refusal.
  */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 20

  private def slices: Seq[Seq[(Long, String)]] = {
    val all = (0L until 300L).map(i => (i, s"doc $i"))
    // Batch 2 re-delivers half of batch 0 (at-least-once overlap).
    Seq(all.slice(0, 100), all.slice(100, 200),
      all.slice(200, 300) ++ all.slice(0, 50))
  }

  private def docs(s: Seq[(Long, String)]) = s.toDF("doc_id", "text")

  private def stateIds(dir: String): Seq[Long] =
    SampleStream.sample(spark, dir).orderBy("rnk", "key")
      .collect().map(_.getLong(0)).toSeq

  test("streamed sample equals the one-shot bottom-k of distinct docs seen; overlap is immune") {
    val dir = Files.createTempDirectory("graft-smpstream").toString
    val fn = SampleStream.pipeline(dir, K)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(docs(s), i.toLong)
      val seen = slices.take(i + 1).flatten.map(_._1).distinct
      val oneShot = Sampling.bottomK(
          seen.map(x => (x, s"doc $x")).toDF("doc_id", "text"), "doc_id", K)
        .orderBy("smp_rn").collect().map(_.getLong(0)).toSeq
      assert(stateIds(dir) == oneShot, s"after batch $i")
    }
  }

  test("the committed state IS a KMV synopsis: distinct read == batch Kmv exactly; exact below k") {
    import graft.operators.Kmv
    val dir = Files.createTempDirectory("graft-smpkmv").toString
    val fn = SampleStream.pipeline(dir, K)
    assert(SampleStream.kmvDistinctEstimate(spark, dir) == 0.0)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(docs(s), i.toLong)
      val seen = slices.take(i + 1).flatten.map(_._1).distinct
      // Same hash family (Sampling.rank == Kmv.hash at equal salt), so
      // the streamed read must equal the one-shot KMV estimate EXACTLY
      // — not statistically.
      val oneShot = Kmv.distinctEstimate(
        Kmv.signature(seen.toDF("doc_id"), "doc_id", K, salt = "smp"), K)
        .head().getDouble(1)
      assert(SampleStream.kmvDistinctEstimate(spark, dir) == oneShot,
        s"after batch $i")
    }
    // Redelivery cannot move the estimate (same doc ⇒ same rank).
    fn(docs(slices.head), slices.size.toLong)
    val est = SampleStream.kmvDistinctEstimate(spark, dir)
    assert(est == Kmv.distinctEstimate(
      Kmv.signature(slices.flatten.map(_._1).distinct.toDF("doc_id"),
        "doc_id", K, salt = "smp"), K).head().getDouble(1))
    // Below k the state holds every distinct key: the count is EXACT.
    val dir2 = Files.createTempDirectory("graft-smpkmv2").toString
    SampleStream.pipeline(dir2, K)(docs(slices.head.take(15)), 0L)
    assert(SampleStream.kmvDistinctEstimate(spark, dir2) == 15.0)
  }

  test("replay no-op; stale and mismatched (k, salt) refuse") {
    val dir = Files.createTempDirectory("graft-smpreplay").toString
    val fn = SampleStream.pipeline(dir, K)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = stateIds(dir)
    val metaBefore = SampleStream.readMeta(spark, dir)
    fn(docs(slices.last), (slices.size - 1).toLong)
    assert(stateIds(dir) == before)
    assert(SampleStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(docs(slices.head), 0L) }
    intercept[IllegalStateException] {
      SampleStream.pipeline(dir, K + 5)(docs(slices.head), 3L)
    }
    intercept[IllegalStateException] {
      SampleStream.pipeline(dir, K, salt = "other")(docs(slices.head), 3L)
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot sample") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-smpengine").toString
    val fn = SampleStream.pipeline(dir, K)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val seen = slices.flatten.map(_._1).distinct
    val oneShot = Sampling.bottomK(
        seen.map(x => (x, s"doc $x")).toDF("doc_id", "text"), "doc_id", K)
      .orderBy("smp_rn").collect().map(_.getLong(0)).toSeq
    assert(stateIds(dir) == oneShot)
  }

  test("foreign metaless state fails loudly") {
    val dir = Files.createTempDirectory("graft-smpforeign").toString
    Seq((1L, "x", 2L)).toDF("key", "text", "rnk")
      .write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] {
      SampleStream.readMeta(spark, dir)
    }
  }
}
