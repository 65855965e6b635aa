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
}
