package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed substring dedup's law: spans over the summed cross-batch
  * gram counts ≡ [[Dedup.duplicateSpans]] over the union of all arrivals,
  * for ANY batch slicing — including spans whose two occurrences arrive
  * in DIFFERENT batches (the case a per-batch run of the batch operator
  * misses, and the reason the stream exists). Plus the family contract:
  * replay idempotence, stale throw, manifest/k validation, at-least-once
  * doc re-send immunity, fold-cadence invariance, and the engine leg.
  */
class SubstrDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  /** Corpus with within-batch AND cross-batch duplicated spans: docs 0/1
    * share "w x y z q" (batch 0), docs 2/5 share "a b c d e f" but doc 5
    * arrives two batches later (cross-batch), docs 3/4 are clean, doc 6
    * self-repeats a window.
    */
  private val docsAll = Seq(
    (0L, "p q r w x y z q tail0 end0"),
    (1L, "head1 w x y z q mid1 tail1"),
    (2L, "a b c d e f suffix2 s2b"),
    (3L, "clean three has no dup windows at all"),
    (4L, "another clean document with unique tokens only"),
    (5L, "prefix5 a b c d e f p5b"),
    (6L, "m n o p m n o p m6 tail6"))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val slices: Seq[Seq[(Long, String)]] = Seq(
    docsAll.slice(0, 2), docsAll.slice(2, 5), docsAll.slice(5, 7))

  private def collectSpans(d: DataFrame): Set[(Long, Long, Long)] =
    d.select(col("doc_id").cast("long"), col("s").cast("long"),
      col("e").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchTruth: Set[(Long, Long, Long)] =
    collectSpans(Dedup.duplicateSpans(df(docsAll), K))

  test("stream spans == batch spans over the union, cross-batch dups included") {
    val dir = Files.createTempDirectory("graft-ssd").toString
    val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = 2)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val streamed = collectSpans(SubstrDedupStream.spans(spark, dir))
    assert(streamed == batchTruth, s"stream $streamed vs batch $batchTruth")
    // The cross-batch pair (docs 2 and 5, batches 1 and 3 apart) is in.
    assert(streamed.exists(_._1 == 2L) && streamed.exists(_._1 == 5L),
      "cross-batch duplicated span detected on both sides")
    // And strip over the state matches the batch strip, fingerprints too.
    val sStrip = SubstrDedupStream.strip(spark, dir, df(docsAll))
      .select(col("doc_id"), col("n_spans"), col("n_removed"),
        md5(col("clean_text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val bStrip = Dedup.stripDuplicateSpans(df(docsAll), K)
      .select(col("doc_id"), col("n_spans"), col("n_removed"),
        md5(col("clean_text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(sStrip == bStrip)
  }

  test("arrival order does not matter (confluence over slicings)") {
    val alt = Seq(docsAll.slice(5, 7), docsAll.slice(0, 2),
      docsAll.slice(2, 5))
    val dir = Files.createTempDirectory("graft-ssd-order").toString
    val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = 3)
    alt.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(collectSpans(SubstrDedupStream.spans(spark, dir)) == batchTruth)
  }

  test("fold cadence is invisible: foldEvery 1 == foldEvery 100") {
    val dirs = Seq(1, 100).map { fe =>
      val dir = Files.createTempDirectory(s"graft-ssd-fold$fe").toString
      val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = fe)
      slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
      dir
    }
    val Seq(a, b) = dirs.map(d =>
      collectSpans(SubstrDedupStream.spans(spark, d)))
    assert(a == b && a == batchTruth)
    // foldEvery=1 folds every batch: its read serves from the counts
    // generation with an empty tail; meta pins the fold frontier.
    val m1 = SubstrDedupStream.readMeta(spark, dirs.head).get
    assert(m1.foldedThrough == 2L && m1.countsGen >= 0L)
  }

  test("replay of the committed batch is a skip, not a double count") {
    val dir = Files.createTempDirectory("graft-ssd-replay").toString
    var lastTotal = -1L
    val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = 2,
      onBatch = (_, _, t) => lastTotal = t)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = collectSpans(SubstrDedupStream.spans(spark, dir))
    val totalBefore = lastTotal
    fn(df(slices.last), (slices.size - 1).toLong) // at-least-once replay
    assert(lastTotal == totalBefore, "replay re-emits the committed total")
    assert(collectSpans(SubstrDedupStream.spans(spark, dir)) == before)
  }

  test("a batch below the committed high-water refuses loudly") {
    val dir = Files.createTempDirectory("graft-ssd-stale").toString
    val fn = SubstrDedupStream.pipeline(dir, K)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    intercept[IllegalStateException] { fn(df(slices.head), 0L) }
  }

  test("gram-size mismatch refuses instead of mixing gram spaces") {
    val dir = Files.createTempDirectory("graft-ssd-k").toString
    SubstrDedupStream.pipeline(dir, K)(df(slices.head), 0L)
    intercept[IllegalStateException] {
      SubstrDedupStream.pipeline(dir, K + 1)(df(slices(1)), 1L)
    }
  }

  test("cross-batch doc re-sends are dropped, not self-duplicated") {
    val dir = Files.createTempDirectory("graft-ssd-resend").toString
    var newDocs = Seq.empty[Long]
    val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = 2,
      onBatch = (_, n, _) => newDocs :+= n)
    fn(df(slices.head), 0L)
    // Batch 1 re-delivers doc 0 alongside genuinely new docs: its grams
    // must not enter the log twice (they would flag every window of doc
    // 0 — and its span partner doc 1 — as duplicated at higher counts).
    fn(df(docsAll.slice(2, 5) ++ Seq(docsAll.head)), 1L)
    fn(df(slices(2)), 2L)
    assert(newDocs == Seq(2L, 3L, 2L), s"re-sent doc not re-counted: $newDocs")
    assert(collectSpans(SubstrDedupStream.spans(spark, dir)) == batchTruth)
  }

  test("under the streaming engine: MemoryStream slices converge to batch truth") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-ssd-engine").toString
    val fn = SubstrDedupStream.pipeline(dir, K, foldEvery = 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(collectSpans(SubstrDedupStream.spans(spark, dir)) == batchTruth)
  }

  test("fresh state: empty spans, strip passes docs through clean") {
    val dir = Files.createTempDirectory("graft-ssd-fresh").toString
    assert(SubstrDedupStream.spans(spark, dir).count() == 0L)
    val out = SubstrDedupStream.strip(spark, dir, df(docsAll))
    assert(out.where(col("n_spans") =!= 0L).count() == 0L)
    assert(out.count() == docsAll.size.toLong)
  }
}
