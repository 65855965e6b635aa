package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HLL union is register-wise max, so the committed cross-batch
  * sketch must equal the UNION of the per-batch sketches — and the
  * streamed estimate equals a one-shot `hll_union_agg` over those
  * batch sketches EXACTLY (same register state, same composite
  * estimator). A DIRECTLY-built single-pass sketch is the one thing it
  * may differ from by a few counts: DataSketches uses the more
  * accurate HIP estimator for sketches that saw every update in order,
  * and the composite estimator once a union is involved (both within
  * the lgK error bound) — the spec pins the union-form equality and
  * the accuracy envelope, not a cross-estimator identity that does not
  * hold.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val LgK = 12

  // Overlapping batches: 3 x 400 items with only 800 distinct overall,
  // so per-batch distincts do not sum to the stream distinct.
  private def slices: Seq[Seq[String]] =
    (0 until 3).map(b => (0 until 400).map(i => s"u${(b * 200 + i) % 800}"))

  private def df(s: Seq[String]) = s.toDF("item")

  /** Reference: per-batch sketches union-aggregated in one query — the
    * same register arithmetic the stream commits incrementally.
    */
  private def unionEstimate(batches: Seq[Seq[String]]): Long =
    batches.zipWithIndex
      .flatMap { case (s, i) => s.map(x => (i, x)) }.toDF("b", "item")
      .groupBy("b").agg(hll_sketch_agg(col("item"), lit(LgK)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)

  test("streamed estimate == one-shot union of the batch sketches") {
    val dir = Files.createTempDirectory("graft-hll").toString
    var last = (-1L, -1L)
    val fn = HllStream.pipeline(dir, LgK,
      onBatch = (_, est, total) => last = (est, total))
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(last._2 == 1200L, s"exact row total, got ${last._2}")
    assert(last._1 == unionEstimate(slices),
      "identical register state must give the identical estimate")
    assert(HllStream.estimate(spark, dir) == unionEstimate(slices))
    // Accuracy envelope: both the streamed estimate and the direct
    // single-pass sketch track the true 800 within HLL accuracy (they
    // may differ from each other by the HIP-vs-composite estimator).
    assert(math.abs(last._1 - 800L) <= 40L, s"est ${last._1} vs true 800")
    val direct = df(slices.flatten).agg(hll_sketch_estimate(
      hll_sketch_agg(col("item"), lit(LgK))).as("est")).head().getLong(0)
    assert(math.abs(direct - 800L) <= 40L)
  }

  test("replay of the committed batch is a skip; re-seen items never inflate") {
    val dir = Files.createTempDirectory("graft-hllreplay").toString
    val fn = HllStream.pipeline(dir, LgK)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = HllStream.estimate(spark, dir)
    val metaBefore = HllStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong)
    assert(HllStream.estimate(spark, dir) == before)
    assert(HllStream.readMeta(spark, dir) == metaBefore)
    // A NEW batch that redelivers only already-seen items advances the
    // high-water but cannot move the estimate (idempotent union).
    fn(df(slices.head), slices.size.toLong)
    assert(HllStream.estimate(spark, dir) == before)
  }

  test("stale batch and mismatched lgK refuse loudly; bad lgK refused at construction") {
    val dir = Files.createTempDirectory("graft-hllstale").toString
    val fn = HllStream.pipeline(dir, LgK)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    intercept[IllegalStateException] { fn(df(slices.head), 0L) }
    intercept[IllegalStateException] {
      HllStream.pipeline(dir, LgK + 1)(df(slices.head), 3L)
    }
    intercept[IllegalArgumentException] { HllStream.pipeline(dir, 2) }
  }

  test("empty batches carry no mass; estimate stays correct around them") {
    val dir = Files.createTempDirectory("graft-hllempty").toString
    val fn = HllStream.pipeline(dir, LgK)
    fn(df(Seq.empty), 0L) // leading empty batch: no sketch row yet
    assert(HllStream.estimate(spark, dir) == 0L)
    fn(df(slices.head), 1L)
    fn(df(Seq.empty), 2L)
    fn(df(slices(1)), 3L)
    assert(HllStream.estimate(spark, dir) ==
      unionEstimate(Seq(slices.head, slices(1))))
    assert(HllStream.readMeta(spark, dir).exists(_._1 == 800L))
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot estimate") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-hllengine").toString
    val fn = HllStream.pipeline(dir, LgK)
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("item").writeStream.foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(HllStream.estimate(spark, dir) == unionEstimate(slices))
  }

  test("foreign metaless state fails loudly") {
    val dir = Files.createTempDirectory("graft-hllforeign").toString
    Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("sk")
      .write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] { HllStream.readMeta(spark, dir) }
  }

  // ---- keyed form: the per-key cardinality table ----

  // Skewed keyed slices with cross-batch overlap per key, plus a key
  // ("solo") that appears in exactly ONE batch — the case where a
  // direct (HIP) sketch would leak into the committed state if the
  // merge did not force every survivor through hll_union_agg.
  private def keyedSlices: Seq[Seq[(String, String)]] = Seq(
    (0 until 300).map(i => ("temp", s"d${i % 200}")) ++
      (0 until 80).map(i => ("hum", s"d${i % 60}")),
    (0 until 300).map(i => ("temp", s"d${(100 + i) % 250}")) ++
      (0 until 50).map(i => ("solo", s"s$i")),
    (0 until 120).map(i => ("hum", s"d${(30 + i) % 90}")))

  private def kdf(s: Seq[(String, String)]) = s.toDF("key", "item")

  /** Reference: per-batch grouped sketches, union-aggregated per key in
    * one query — the one-shot form of the stream's incremental merge.
    */
  private def unionEstimateBy(batches: Seq[Seq[(String, String)]])
      : Map[String, Long] =
    batches.zipWithIndex
      .flatMap { case (s, i) => s.map { case (k, x) => (i, k, x) } }
      .toDF("b", "key", "item")
      .groupBy("b", "key").agg(hll_sketch_agg(col("item"), lit(LgK)).as("sk"))
      .groupBy("key").agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("keyed: per-key streamed estimates == one-shot grouped union (incl. a single-batch key)") {
    val dir = Files.createTempDirectory("graft-hllkey").toString
    var lastTotal = -1L
    val fn = HllStream.pipelineBy(dir, LgK,
      onBatch = (_, total) => lastTotal = total)
    keyedSlices.zipWithIndex.foreach { case (s, i) => fn(kdf(s), i.toLong) }
    assert(lastTotal == keyedSlices.map(_.size).sum,
      "meta keeps the exact keyed row total")
    val got = HllStream.estimateBy(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = unionEstimateBy(keyedSlices)
    assert(got == want,
      s"per-key register state must match the one-shot union: $got vs $want")
    // Accuracy envelope on the true per-key distincts.
    val truth = keyedSlices.flatten.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).distinct.size.toLong }
    truth.foreach { case (k, t) =>
      assert(math.abs(got(k) - t) <= math.max(4L, t / 10),
        s"key $k: est ${got(k)} vs true $t")
    }
  }

  test("keyed: replay skips, per-key redelivery cannot inflate, stale/lgK refuse") {
    val dir = Files.createTempDirectory("graft-hllkeyreplay").toString
    val fn = HllStream.pipelineBy(dir, LgK)
    keyedSlices.zipWithIndex.foreach { case (s, i) => fn(kdf(s), i.toLong) }
    val before = HllStream.estimateBy(spark, dir).collect().toSeq.toString
    val metaBefore = HllStream.readKeyedMeta(spark, dir)
    fn(kdf(keyedSlices.last), (keyedSlices.size - 1).toLong) // replay: skip
    assert(HllStream.estimateBy(spark, dir).collect().toSeq.toString == before)
    assert(HllStream.readKeyedMeta(spark, dir) == metaBefore)
    // A NEW batch redelivering only seen (key, item) pairs moves no key.
    fn(kdf(keyedSlices.head), keyedSlices.size.toLong)
    assert(HllStream.estimateBy(spark, dir).collect().toSeq.toString == before)
    intercept[IllegalStateException] { fn(kdf(keyedSlices.head), 0L) }
    intercept[IllegalStateException] {
      HllStream.pipelineBy(dir, LgK + 1)(kdf(keyedSlices.head), 9L)
    }
  }

  test("keyed: under the streaming engine, per-key estimates converge to the one-shot form") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-hllkeyengine").toString
    val fn = HllStream.pipelineBy(dir, LgK)
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("key", "item").writeStream.foreachBatch(fn).start()
    try {
      keyedSlices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = HllStream.estimateBy(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == unionEstimateBy(keyedSlices))
  }
}
