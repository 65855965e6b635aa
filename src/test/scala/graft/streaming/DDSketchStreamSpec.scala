package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.DDSketch
import org.apache.spark.sql.functions._

/** The DDSketch merge is EXACT (summed bucket counts equal the
  * one-shot sketch of the concatenated stream), so the streamed
  * quantiles keep the batch operator's relative-error guarantee across
  * batches. These tests pin that equality, the cross-batch quantile
  * bound, replay idempotence, α validation, the engine leg, and
  * foreign-state refusal.
  */
class DDSketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Alpha = 0.02

  private def slices: Seq[Seq[Double]] = {
    val all = (1 to 300).map(i => math.pow(10, 3.0 * i / 300) + (i % 11))
    all.grouped(100).toSeq
  }

  private def df(s: Seq[Double]) = s.toDF("value")

  private def cellMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cross-batch buckets equal the one-shot sketch; streamed quantiles hold the bound") {
    val dir = Files.createTempDirectory("graft-ddstream").toString
    var lastTotal = -1L
    val fn = DDSketchStream.pipeline(dir, Alpha,
      onBatch = (_, t) => lastTotal = t)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(lastTotal == 300L)
    val streamed = cellMap(DDSketchStream.buckets(spark, dir))
    val oneShot = cellMap(DDSketch.sketch(df(slices.flatten), Alpha))
    assert(streamed == oneShot, "summed sketches == sketch of concatenation")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = DDSketchStream.quantiles(spark, dir, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = slices.flatten.sorted
    for (q <- qs) {
      val exact = sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      assert(math.abs(est(q) - exact) / exact <= Alpha + 1e-6,
        s"q=$q est=${est(q)} exact=$exact")
    }
  }

  test("replay of the committed batch does not double-count") {
    val dir = Files.createTempDirectory("graft-ddreplay").toString
    val fn = DDSketchStream.pipeline(dir, Alpha)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = cellMap(DDSketchStream.buckets(spark, dir))
    val metaBefore = DDSketchStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong)
    assert(cellMap(DDSketchStream.buckets(spark, dir)) == before)
    assert(DDSketchStream.readMeta(spark, dir) == metaBefore)
  }

  test("stale batch and mismatched alpha refuse loudly") {
    val dir = Files.createTempDirectory("graft-ddstale").toString
    val fn = DDSketchStream.pipeline(dir, Alpha)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    intercept[IllegalStateException] { fn(df(slices.head), 0L) }
    intercept[IllegalStateException] {
      DDSketchStream.pipeline(dir, Alpha * 2)(df(slices.head), 3L)
    }
  }

  test("collapsing cap: committed table == one-shot capped table after every batch; cap mismatch refuses") {
    val m = 64
    // 16-decade log-uniform corpus in three rising-range batches —
    // the cutoff must climb across generations.
    val wide = (1 to 600).map(i => math.pow(10, -8 + 16.0 * i / 600))
    val wslices = wide.grouped(200).toSeq
    val dir = Files.createTempDirectory("graft-ddcap").toString
    val fn = DDSketchStream.pipeline(dir, Alpha, maxBuckets = m)
    wslices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      // The merge-compatibility law: per-batch collapsing commits
      // EXACTLY the one-shot capped table, for every prefix.
      val seen = wslices.take(i + 1).flatten
      assert(cellMap(DDSketchStream.buckets(spark, dir)) ==
        cellMap(DDSketch.collapse(DDSketch.sketch(df(seen), Alpha), m)),
        s"after batch $i")
      assert(DDSketchStream.buckets(spark, dir).count() <= m.toLong)
    }
    // Upper quantiles above the cutoff: exactly the UNCAPPED answers,
    // alpha intact.
    val qs = Seq(0.95, 0.99)
    val est = DDSketchStream.quantiles(spark, dir, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val full = DDSketch.quantiles(DDSketch.sketch(df(wide), Alpha), Alpha, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = wide.sorted
    for (q <- qs) {
      assert(est(q) == full(q), s"q=$q capped=${est(q)} uncapped=${full(q)}")
      val exact = sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      assert(math.abs(est(q) - exact) / exact <= Alpha + 1e-6)
    }
    // m is part of the state's identity: a different cap refuses.
    intercept[IllegalStateException] {
      DDSketchStream.pipeline(dir, Alpha, maxBuckets = 32)(df(wide), 9L)
    }
    intercept[IllegalStateException] {
      DDSketchStream.pipeline(dir, Alpha)(df(wide), 9L)
    }
    intercept[IllegalArgumentException] {
      DDSketchStream.pipeline(dir, Alpha, maxBuckets = 1)
    }
  }

  test("keyed collapsing cap: per-key bound holds; within-cap keys exactly the uncapped keyed state") {
    val m = 48
    val wide = (1 to 400).map(i => math.pow(10, -8 + 16.0 * i / 400))
    val rows = wide.map(v => ("w", v)) ++
      (1 to 60).map(i => ("n", 10.0 + i))
    val rslices = Seq(rows.filter(_._2 < 1.0), rows.filterNot(_._2 < 1.0))
    val dir = Files.createTempDirectory("graft-ddcapby").toString
    val fn = DDSketchStream.pipelineBy(dir, Alpha, maxBuckets = m)
    rslices.zipWithIndex.foreach { case (s, i) =>
      fn(s.toDF("key", "value"), i.toLong) }
    val byKey = DDSketchStream.keyedBuckets(spark, dir)
      .groupBy("key").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("w") == m.toLong)
    assert(byKey("n") < m.toLong)
    // The narrow key's cells are exactly the uncapped one-shot's.
    val got = DDSketchStream.keyedBuckets(spark, dir)
      .where(col("key") === "n").select("bucket", "n")
    val want = DDSketch.sketch(
      rows.filter(_._1 == "n").map(_._2).toDF("value"), Alpha)
    assert(cellMap(got) == cellMap(want))
    // And the live SLO read still answers within alpha for p99 of the
    // wide key.
    val est = DDSketchStream.quantilesBy(spark, dir, Seq(0.99))
      .where(col("key") === "w").head().getDouble(2)
    val sorted = wide.sorted
    val exact = sorted(math.max(1, math.ceil(0.99 * sorted.size).toInt) - 1)
    assert(math.abs(est - exact) / exact <= Alpha + 1e-6)
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-ddengine").toString
    val fn = DDSketchStream.pipeline(dir, Alpha)
    val mem = MemoryStream[Double]
    val q = mem.toDF().toDF("value").writeStream.foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(cellMap(DDSketchStream.buckets(spark, dir)) ==
      cellMap(DDSketch.sketch(df(slices.flatten), Alpha)))
    assert(DDSketchStream.readMeta(spark, dir).exists(_._1 == 300L))
  }

  test("keyed form: per-key cells equal the one-shot grouped sketch; live SLO table matches batch") {
    val dir = Files.createTempDirectory("graft-ddkeyed").toString
    val keyed = slices.map(s => s.zipWithIndex.map { case (v, i) =>
      (s"sensor${i % 4}", v) })
    val fn = DDSketchStream.pipelineBy(dir, Alpha)
    keyed.zipWithIndex.foreach { case (s, i) =>
      fn(s.toDF("key", "value"), i.toLong) }
    val streamed = DDSketchStream.keyedBuckets(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = DDSketch.sketchBy(
        keyed.flatten.toDF("key", "value"), Alpha, Seq("key"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == oneShot, "per-key summed cells == grouped one-shot")
    // The live SLO read equals the batch grouped quantiles exactly.
    val live = DDSketchStream.quantilesBy(spark, dir, Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val batchQ = DDSketch.quantilesBy(
        DDSketch.sketchBy(keyed.flatten.toDF("key", "value"), Alpha,
          Seq("key")), Alpha, Seq(0.5, 0.95), Seq("key"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(live == batchQ)
    assert(live.keySet.map(_._1) == Set("sensor0", "sensor1", "sensor2",
      "sensor3"))
    // Same family guards: replay skip, stale throw, alpha refusal.
    val before = streamed
    fn(keyed.last.toDF("key", "value"), (keyed.size - 1).toLong)
    assert(DDSketchStream.keyedBuckets(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap == before)
    intercept[IllegalStateException] {
      fn(keyed.head.toDF("key", "value"), 0L)
    }
    intercept[IllegalStateException] {
      DDSketchStream.pipelineBy(dir, Alpha * 2)(
        keyed.head.toDF("key", "value"), keyed.size.toLong)
    }
  }

  test("fresh state has no quantiles; foreign metaless state fails loudly") {
    val fresh = Files.createTempDirectory("graft-ddfresh").toString
    assert(DDSketchStream.quantiles(spark, fresh, Seq(0.5)).count() == 0L)
    val dir = Files.createTempDirectory("graft-ddforeign").toString
    Seq((1L, 2L)).toDF("bucket", "n").write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] { DDSketchStream.readMeta(spark, dir) }
  }
}
