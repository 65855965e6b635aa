package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The OFF-PATH index compaction ([[StreamingDedup.minhashDedupPipeline]],
  * `asyncCompact = true`): the O(index) clustered rewrite runs on a
  * daemon thread over a frozen file-list snapshot while batches keep
  * deduping against (and appending to) the old generation; the swap
  * carries the copy window's appends as a listing delta. Same test
  * posture as [[AsyncRebuildSpec]]: the foreachBatch function is driven
  * directly and `compactGate` holds the copy window open as a latch.
  */
class AsyncCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
  private def doc(words: Seq[String]) = words.mkString(" ")
  private val base = (0 until 20).map(i => s"w$i")
  private val docW = doc(base)
  // X replaces 6 of W's 20 tokens → J(X,W) ≈ 0.538 ≥ 0.5 (dup of W).
  private val docX = doc(base.zipWithIndex.map { case (w, i) =>
    if (i < 6) s"x$i" else w })
  private val docN = doc((0 until 20).map(i => s"n$i"))
  private val docB = doc((0 until 20).map(i => s"b$i"))
  private val docB2 = doc((0 until 20).map(i => if (i == 0) "bb0" else s"b$i"))
  private val docC = doc((0 until 20).map(i => s"c$i"))
  private def probeDoc(i: Int) = doc((0 until 20).map(j => s"p${i}q$j"))

  private def survivors(dir: String): Set[Long] =
    StreamingDedup.survivorsTable(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  private def exists(path: String) =
    GenStore.fs(spark, path).exists(new Path(path))

  test("async compaction: dedup continues on the old generation during " +
      "the copy; swap carries the window delta and drops the old gen") {
    val idx = Files.createTempDirectory("graft-acomp-idx").toString
    val out = Files.createTempDirectory("graft-acomp-out").toString
    val idx2 = Files.createTempDirectory("graft-acomp-idx2").toString
    val out2 = Files.createTempDirectory("graft-acomp-out2").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    StreamingDedup.initMinhashIndex(spark, idx2, numPerms = 64, bands = 32)
    val started = new CountDownLatch(1)
    val hold = new CountDownLatch(1)
    // compactAtFiles = 1 keeps the growth trigger standing, so batches
    // AFTER the asserted swap submit again — park those tail copiers on
    // a never-released latch (daemon threads, reaped at JVM exit before
    // starting any job) so no background write outlives the test.
    val parked = new CountDownLatch(1)
    val attempt = new AtomicInteger(0)
    var compactions = Vector.empty[(Long, Long)]
    // compactAtFiles = 1: the first batch that finds any data file
    // submits — the deterministic trigger the inline test uses.
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, compactAtFiles = 1,
      asyncCompact = true,
      onCompact = (b, g) => compactions :+= ((b, g)),
      compactGate = () => attempt.incrementAndGet() match {
        case 1 => started.countDown(); hold.await()
        case _ => parked.await()
      })
    // The uncompacted twin: same arrivals, compaction disabled — the
    // async run must produce the identical survivor set and index rows.
    val un = StreamingDedup.minhashDedupPipeline(spark, idx2, out2,
      numPerms = 64, bands = 32, compactAtFiles = Int.MaxValue)
    var fed = Vector.empty[Seq[(Long, String, Timestamp)]]
    def feed(b: Seq[(Long, String, Timestamp)], id: Long): Unit = {
      fn(b.toDF("doc_id", "text", "ts"), id)
      fed :+= b
    }
    feed(Seq((1L, docW, ts(0)), (2L, docN, ts(1))), 0L) // both novel
    // Batch 1 SUBMITS the copy (the index now has files) and still
    // processes on gen 0: X must drop against the stored W mid-window.
    feed(Seq((3L, docX, ts(2)), (4L, docB, ts(3))), 1L)
    assert(started.await(60, TimeUnit.SECONDS), "copier never reached the gate")
    assert(GenStore.latest(spark, idx) == 0L,
      "mid-copy, readers must still resolve gen 0")
    assert(compactions.isEmpty, "no swap while the copy window is open")
    // Copy window: B2 drops against B — an admission the SNAPSHOT does
    // not contain (batch 1 appended after the listing), proving window
    // batches read the live old generation, not the frozen copy.
    feed(Seq((5L, docB2, ts(4)), (6L, docC, ts(5))), 2L)
    assert(GenStore.latest(spark, idx) == 0L)
    hold.countDown()
    // Probe novel docs until the swap lands.
    var probeId = 100
    var batchId = 3L
    val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
    while (GenStore.latest(spark, idx) == 0L &&
        System.nanoTime() < deadline) {
      feed(Seq((probeId.toLong, probeDoc(probeId), ts(10))), batchId)
      probeId += 1; batchId += 1
      Thread.sleep(100)
    }
    assert(GenStore.latest(spark, idx) >= 1L, "swap committed")
    assert(compactions.nonEmpty && compactions.head._2 == 1L,
      s"first swap to gen 1: $compactions")
    assert(!exists(s"$idx/gen-0"), "old generation dropped at the swap")
    // Post-swap dedup memory: a dup of a SNAPSHOT-resident admission
    // (W, via the clustered copy) and a dup of a WINDOW admission (C,
    // via the listing delta) must both still drop.
    feed(Seq((500L, docX, ts(20)), (501L, docC, ts(21))), batchId)
    batchId += 1
    // Twin run over the identical arrival history.
    fed.zipWithIndex.foreach { case (b, i) =>
      un(b.toDF("doc_id", "text", "ts"), i.toLong)
    }
    assert(survivors(out) == survivors(out2),
      s"async-compacted survivors ≡ uncompacted twin: " +
        s"${survivors(out)} vs ${survivors(out2)}")
    assert(!survivors(out).contains(500L) && !survivors(out).contains(501L))
    // Index rows preserved exactly through copy + delta.
    assert(StreamingDedup.bandsTable(spark, idx)
        .orderBy("doc_id", "band").collect().toSeq ==
      StreamingDedup.bandsTable(spark, idx2)
        .orderBy("doc_id", "band").collect().toSeq,
      "bands rows ≡ uncompacted twin")
    assert(StreamingDedup.toksTable(spark, idx).count() ==
      StreamingDedup.toksTable(spark, idx2).count())
    // Replay ACROSS the async boundary — the inline test's replay law:
    // re-running a pre-swap batch (same batch id) after the swap finds
    // its own admissions in the carried-over generation, self-matches,
    // and changes nothing.
    val before = survivors(out)
    fn(Seq((5L, docB2, ts(4)), (6L, docC, ts(5)))
      .toDF("doc_id", "text", "ts"), 2L)
    assert(survivors(out) == before,
      "a pre-swap batch replayed post-swap absorbs idempotently")
  }

  test("async compaction: a failed copy surfaces with its orphan reaped, " +
      "and the growth trigger re-submits to completion") {
    val idx = Files.createTempDirectory("graft-acompfail-idx").toString
    val out = Files.createTempDirectory("graft-acompfail-out").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val attempts = new AtomicInteger(0)
    val parked = new CountDownLatch(1) // tail submissions park (see above)
    var surfaced = Vector.empty[(Long, String)]
    var orphanGoneAtSurface = false
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, compactAtFiles = 1,
      asyncCompact = true,
      compactGate = () => attempts.incrementAndGet() match {
        case 1 => throw new RuntimeException("planted copy failure")
        case 2 =>
        case _ => parked.await()
      },
      onCompactError = (b, e) => {
        orphanGoneAtSurface = !exists(s"$idx/gen-1")
        surfaced :+= ((b, e.getMessage))
      })
    fn(Seq((1L, docW, ts(0))).toDF("doc_id", "text", "ts"), 0L)
    // Keep feeding novel docs: the first trigger's copier dies on the
    // planted failure; a later batch surfaces it and — the growth
    // condition still standing — re-submits; the gate now passes and a
    // still-later batch swaps.
    var probeId = 100
    var batchId = 1L
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (GenStore.latest(spark, idx) == 0L &&
        System.nanoTime() < deadline) {
      fn(Seq((probeId.toLong, probeDoc(probeId), ts(5)))
        .toDF("doc_id", "text", "ts"), batchId)
      probeId += 1; batchId += 1
      Thread.sleep(100)
    }
    assert(surfaced.nonEmpty, "the planted failure surfaced on the stream thread")
    assert(surfaced.head._2 == "planted copy failure", surfaced.toString)
    assert(orphanGoneAtSurface,
      "the failed copy's orphan gen dir was reaped before surfacing")
    assert(attempts.get() >= 2, "the growth trigger re-submitted")
    assert(GenStore.latest(spark, idx) >= 1L,
      "the re-submitted copy completed and swapped")
    // Dedup memory intact across failure + recovery.
    fn(Seq((900L, docX, ts(30))).toDF("doc_id", "text", "ts"), batchId)
    assert(!survivors(out).contains(900L),
      "a dup of the pre-failure admission still drops")
  }
}
