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

  // -------------------- stratified (keyed) form --------------------

  // Skewed strata: "head" floods with 270 docs, "tail" has 12, "mid"
  // 18 — the regime a GLOBAL sample fails (the head crowds out every
  // tail doc) and the stratified state must not. Doc ids are disjoint
  // across strata; batch 2 re-delivers half of batch 0.
  private def kslices: Seq[Seq[(String, Long, String)]] = {
    val head = (0L until 270L).map(i => ("head", i, s"doc $i"))
    val tail = (1000L until 1012L).map(i => ("tail", i, s"doc $i"))
    val mid = (2000L until 2018L).map(i => ("mid", i, s"doc $i"))
    val all = head ++ tail ++ mid
    Seq(all.filter(_._2 % 3 == 0), all.filter(_._2 % 3 == 1),
      all.filter(_._2 % 3 == 2) ++ all.filter(_._2 % 3 == 0).take(40))
  }

  private def kdocs(s: Seq[(String, Long, String)]) =
    s.toDF("stratum", "doc_id", "text")

  test("stratified: each stratum's state == one-shot bottom-k of ITS distinct docs; tail strata survive the head flood") {
    val dir = Files.createTempDirectory("graft-smpstrat").toString
    val fn = SampleStream.pipelineBy(dir, K)
    kslices.zipWithIndex.foreach { case (s, i) =>
      fn(kdocs(s), i.toLong)
      val seen = kslices.take(i + 1).flatten.distinct
      for (st <- Seq("head", "tail", "mid")) {
        val got = SampleStream.stratifiedSample(spark, dir)
          .where($"stratum" === st).orderBy("rnk", "key")
          .collect().map(_.getLong(1)).toSeq
        val mine = seen.filter(_._1 == st)
        val oneShot = Sampling.bottomK(
            mine.map(p => (p._2, p._3)).toDF("doc_id", "text"), "doc_id", K)
          .orderBy("smp_rn").collect().map(_.getLong(0)).toSeq
        assert(got == oneShot, s"stratum $st after batch $i")
      }
    }
    // The stratified point: head is capped at K while tail/mid keep
    // EVERY doc they ever carried (below k — exact).
    val sizes = SampleStream.stratifiedSample(spark, dir)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("head") == K.toLong)
    assert(sizes("tail") == 12L && sizes("mid") == 18L)
  }

  test("stratified: estimateBy is exact below k and the KMV basic estimator at k") {
    import graft.operators.Kmv
    val dir = Files.createTempDirectory("graft-smpstratkmv").toString
    val fn = SampleStream.pipelineBy(dir, K)
    kslices.zipWithIndex.foreach { case (s, i) => fn(kdocs(s), i.toLong) }
    val est = SampleStream.estimateBy(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est("tail") == ((12L, 12.0)) && est("mid") == ((18L, 18.0)),
      s"below-k strata must be exact: $est")
    val headIds = kslices.flatten.filter(_._1 == "head").map(_._2).distinct
    val oneShot = Kmv.distinctEstimate(
        Kmv.signature(headIds.toDF("doc_id"), "doc_id", K, salt = "smp"), K)
      .head().getDouble(1)
    assert(est("head")._2 == oneShot, "at-k stratum must equal batch Kmv")
  }

  test("stratified: replay no-op; stale/(k, salt) refuse; null doc_id dropped; fresh empty") {
    val dir = Files.createTempDirectory("graft-smpstratre").toString
    assert(SampleStream.stratifiedSample(spark, dir).count() == 0L)
    assert(SampleStream.estimateBy(spark, dir).count() == 0L)
    val fn = SampleStream.pipelineBy(dir, K)
    val dirty = kdocs(kslices.head).unionByName(
      Seq((Option("head"), Option.empty[Long], Option("ghost")))
        .toDF("stratum", "doc_id", "text"))
    fn(dirty, 0L)
    val metaAfter0 = SampleStream.readKeyedMeta(spark, dir)
    fn(kdocs(kslices.head), 0L) // replay: skip
    assert(SampleStream.readKeyedMeta(spark, dir) == metaAfter0)
    intercept[IllegalStateException] { fn(kdocs(kslices.head), -1L) }
    intercept[IllegalStateException] {
      SampleStream.pipelineBy(dir, K + 1)(kdocs(kslices.head), 5L)
    }
    intercept[IllegalStateException] {
      SampleStream.pipelineBy(dir, K, salt = "other")(kdocs(kslices.head), 5L)
    }
    // The null-doc row is gone: every state row has a rank.
    assert(SampleStream.stratifiedSample(spark, dir)
      .where($"rnk".isNull || $"key".isNull).count() == 0L)
  }

  test("stratified under the streaming engine: MemoryStream batches converge per stratum") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-smpstrateng").toString
    val fn = SampleStream.pipelineBy(dir, K)
    val mem = MemoryStream[(String, Long, String)]
    val q = mem.toDF().toDF("stratum", "doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      kslices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    for (st <- Seq("head", "tail", "mid")) {
      val got = SampleStream.stratifiedSample(spark, dir)
        .where($"stratum" === st).orderBy("rnk", "key")
        .collect().map(_.getLong(1)).toSeq
      val mine = kslices.flatten.filter(_._1 == st).distinct
      val oneShot = Sampling.bottomK(
          mine.map(p => (p._2, p._3)).toDF("doc_id", "text"), "doc_id", K)
        .orderBy("smp_rn").collect().map(_.getLong(0)).toSeq
      assert(got == oneShot, s"stratum $st")
    }
  }
}
