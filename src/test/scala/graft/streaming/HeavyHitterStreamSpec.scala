package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** The cross-batch sketch is NOT required to equal the single-pass
  * sketch (Misra-Gries summaries are merge-order dependent below the
  * guarantee line); what must hold, and what these tests pin, is the
  * mergeable-summaries contract: exact total, every φ-frequent item
  * present with a bounded undercount, replay idempotence, and the
  * exact-verification composition.
  */
class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  // Three batches over a 4105-distinct vocabulary with five planted
  // heavies (total 10k tokens; h0..h4 = 1400,1200,1000,800,600),
  // interleaved deterministically and cut into thirds so every batch
  // carries a slice of each heavy plus eviction-pressure tail.
  private def slices: Seq[Seq[String]] = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(1400 - 200 * i)(s"h$i"))
    val mid = (0 until 100).flatMap(i => Seq.fill(10)(s"m$i"))
    val tail = (0 until 4000).map(i => s"t$i")
    val all = new scala.util.Random(7).shuffle((heavy ++ mid ++ tail).toVector)
    all.grouped((all.size + 2) / 3).toSeq
  }

  private def docs(toks: Seq[String]) =
    toks.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")

  test("guarantee survives cross-batch merging; total is exact") {
    val dir = Files.createTempDirectory("graft-hhstream").toString
    var last: (Long, Map[String, Long]) = (0L, Map.empty)
    val fn = HeavyHitterStream.pipeline(dir, m = 32,
      onBatch = (_, total, counters) => last = (total, counters))
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val (total, counters) = last
    assert(total == 10000L, s"exact stream total, got $total")
    // Every item with freq > N/(m+1) = 303 must be present: h0..h4.
    for (i <- 0 until 5) {
      val truth = 1400 - 200 * i
      val got = counters.getOrElse(s"h$i", 0L)
      assert(got > 0, s"h$i (freq $truth) must survive the merged summary")
      assert(got <= truth, s"sketch counts never overcount: h$i $got > $truth")
      assert(truth - got <= total / (32 + 1),
        s"undercount bound: h$i $got vs $truth")
    }
    assert(counters.size <= 32, "state bounded by m")
    // Persisted state round-trips through readState/candidates.
    val cand = HeavyHitterStream.candidates(spark, dir).collect()
    assert(cand.map(_.getString(0)).toSet == counters.keySet)
    assert(cand.forall(_.getLong(2) == 10000L))
  }

  test("replay of the committed batch does not double-count") {
    val dir = Files.createTempDirectory("graft-hhreplay").toString
    val fn = HeavyHitterStream.pipeline(dir, m = 32)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = HeavyHitterStream.readState(spark, dir).get
    fn(docs(slices.last), (slices.size - 1).toLong) // at-least-once replay
    val after = HeavyHitterStream.readState(spark, dir).get
    assert(after == before,
      "replaying the high-water batch must leave the summary untouched")
  }

  test("a batch below the committed high-water refuses loudly") {
    // A checkpoint restored from an OLDER snapshot than the state dir
    // replays a batch the summary has already moved past — neither
    // merging (double-count) nor re-emitting (wrong as-of state) is
    // faithful, so the pipeline throws instead of silently breaking
    // the N/(m+1) undercount bound.
    val dir = Files.createTempDirectory("graft-hhstale").toString
    val fn = HeavyHitterStream.pipeline(dir, m = 32)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = HeavyHitterStream.readState(spark, dir).get
    val e = intercept[IllegalStateException] {
      fn(docs(slices.head), 0L) // stale: high-water is 2
    }
    assert(e.getMessage.contains("older snapshot"), e.getMessage)
    assert(HeavyHitterStream.readState(spark, dir).get == before,
      "the refused batch must not touch the committed state")
  }

  test("composition: exact heavy hitters over the archive are all stream candidates") {
    val dir = Files.createTempDirectory("graft-hhcompose").toString
    val fn = HeavyHitterStream.pipeline(dir, m = 32)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val streamCands = HeavyHitterStream.candidates(spark, dir)
      .collect().map(_.getString(0)).toSet
    // The certified set (φ = 5%, archived union) must be a subset of
    // the stream's candidate surface — the verification pass never has
    // to look outside the bounded state.
    val exact = HeavyHitters.frequentItems(
        spark.createDataset(slices.flatten), num = 5, denom = 100, m = 32)
      .collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty && exact.subsetOf(streamCands), s"$exact vs $streamCands")
  }

  test("under the streaming engine: MemoryStream batches converge to the same summary") {
    // Direct-driven tests prove the contract; this leg runs the SAME
    // pipeline through writeStream.foreachBatch — the engine thread is
    // the single writer the generation protocol assumes.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-hhengine").toString
    val fn = HeavyHitterStream.pipeline(dir, m = 32)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s =>
        mem.addData(docs(s).collect().map(r =>
          (r.getLong(0), r.getString(1))).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val (counters, total, _) = HeavyHitterStream.readState(spark, dir).get
    assert(total == 10000L)
    assert((0 until 5).forall(i => counters.contains(s"h$i")),
      s"engine-driven summary keeps every planted heavy: ${counters.keySet}")
  }

  test("foreign counterless state fails loudly") {
    val dir = Files.createTempDirectory("graft-hhforeign").toString
    Seq(("x", 1L, 1L, 0L)).toDF("item", "cnt", "total", "batch_id")
      .write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] {
      HeavyHitterStream.readState(spark, dir)
    }
  }
}
