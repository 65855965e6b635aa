package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed mixture construction ([[MixtureStream]]): stream ≡
  * batch greedy prefix under id-ordered arrival, replay idempotence,
  * and state compaction across batches.
  */
class MixtureStreamSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic corpus: doc_id i of domain d has text with (i % 5 + 1)
  // whitespace tokens.
  private def docs(ids: Seq[Int], domain: String) =
    ids.map(i => (i.toLong, domain, Seq.fill(i % 5 + 1)("tok").mkString(" ")))

  /** The batch greedy prefix in doc_id order over the union — the form
    * the stream must equal: run over EVERY doc (dropped docs stay
    * charged), keep while run <= share.
    */
  private def batchSelection(all: Seq[(Long, String, String)],
      share: Long): Set[(Long, String)] = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .withColumn("run", sum("n").over(w))
      .where(col("run") <= share)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def streamSurvivors(dir: String): Set[(Long, String)] =
    MixtureStream.survivors(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("stream ≡ batch greedy prefix cross-batch; overflowed domains stay closed") {
    val sdir = Files.createTempDirectory("graft-mixsurv").toString
    val state = Files.createTempDirectory("graft-mixstate").toString
    // Domain shares: 20 tokens. srcA arrives over three batches and
    // overflows mid-stream; srcB stays under share; srcC's FIRST doc
    // alone exceeds the share (charged, never selected — the q_ml13
    // audit edge).
    val b1 = docs(0 until 4, "srcA") ++ docs(100 until 102, "srcB")
    val b2 = docs(4 until 10, "srcA") ++ docs(102 until 104, "srcB") ++
      Seq((200L, "srcC", Seq.fill(30)("tok").mkString(" ")))
    val b3 = docs(10 until 14, "srcA") ++ docs(104 until 106, "srcB") ++
      Seq((201L, "srcC", "tok"))
    val fn = MixtureStream.mixturePipeline(sdir, state, sharePerDomain = 20L)
    fn(b1.toDF("doc_id", "source", "text"), 0L)
    fn(b2.toDF("doc_id", "source", "text"), 1L)
    fn(b3.toDF("doc_id", "source", "text"), 2L)
    val expected = batchSelection(b1 ++ b2 ++ b3, 20L)
    assert(streamSurvivors(sdir) == expected,
      s"stream ≡ batch: ${streamSurvivors(sdir)} vs $expected")
    // srcC: charged but empty-handed — present in the audit with zeros.
    val audit = MixtureStream.domainAudit(spark, sdir, state)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit("srcC")._1 == 0L && audit("srcC")._2 == 0L &&
      audit("srcC")._3 == 31L, s"srcC audit: ${audit("srcC")}")
    assert(audit.keySet == Set("srcA", "srcB", "srcC"))
    // srcA closed: nothing of batch 3's srcA docs survived beyond the
    // prefix the batch form keeps (sanity via the differential above;
    // here just pin that the charged total kept growing).
    assert(audit("srcA")._3 ==
      (0 until 14).map(i => i % 5 + 1).sum.toLong, audit("srcA").toString)
  }

  test("replayed batch reproduces its selection exactly (partition overwrite + before-state)") {
    val sdir = Files.createTempDirectory("graft-mixsurv2").toString
    val state = Files.createTempDirectory("graft-mixstate2").toString
    val b1 = docs(0 until 4, "srcA")
    val b2 = docs(4 until 8, "srcA")
    val fn = MixtureStream.mixturePipeline(sdir, state, sharePerDomain = 12L)
    fn(b1.toDF("doc_id", "source", "text"), 0L)
    fn(b2.toDF("doc_id", "source", "text"), 1L)
    val before = streamSurvivors(sdir)
    val auditBefore = MixtureStream.domainAudit(spark, sdir, state).collect().toSeq
    // foreachBatch is at-least-once: replay batch 1 verbatim. The state
    // row for batch 1 resolves `before`, the partition overwrite
    // rewrites identical rows.
    fn(b2.toDF("doc_id", "source", "text"), 1L)
    assert(streamSurvivors(sdir) == before, "replay must not change survivors")
    assert(MixtureStream.domainAudit(spark, sdir, state).collect().toSeq ==
      auditBefore, "replay must not change the audit")
  }

  test("under the streaming engine: MemoryStream batches reproduce the batch selection") {
    // The direct-driven tests prove the law deterministically; this leg
    // runs the SAME pipeline through writeStream.foreachBatch — the
    // micro-batch engine's thread is the single writer the state
    // protocol assumes.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sdir = Files.createTempDirectory("graft-mixsurv4").toString
    val state = Files.createTempDirectory("graft-mixstate4").toString
    val fn = MixtureStream.mixturePipeline(sdir, state, sharePerDomain = 20L)
    val b1 = docs(0 until 4, "srcA") ++ docs(100 until 102, "srcB")
    val b2 = docs(4 until 10, "srcA") ++ docs(102 until 104, "srcB")
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch(fn).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(streamSurvivors(sdir) == batchSelection(b1 ++ b2, 20L),
      "engine-driven stream ≡ batch greedy prefix")
  }

  test("state log compacts to one row per domain; selection law survives the boundary") {
    val sdir = Files.createTempDirectory("graft-mixsurv3").toString
    val state = Files.createTempDirectory("graft-mixstate3").toString
    // compactEvery = 2: the gen-0 log compacts during batch 2.
    val fn = MixtureStream.mixturePipeline(sdir, state,
      sharePerDomain = 100L, compactEvery = 2)
    val all = (0 until 4).map { b =>
      val batch = docs(b * 3 until (b + 1) * 3, "srcA") ++
        docs(100 + b * 2 until 100 + (b + 1) * 2, "srcB")
      fn(batch.toDF("doc_id", "source", "text"), b.toLong)
      batch
    }.reduce(_ ++ _)
    assert(GenStore.committed(spark, state).max >= 1L,
      "the state log compacted into a later generation")
    assert(streamSurvivors(sdir) == batchSelection(all, 100L),
      "stream ≡ batch across the compaction boundary")
  }
}
