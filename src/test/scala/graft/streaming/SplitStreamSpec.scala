package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DataSplits, Dedup}

/** [[SplitStream]] laws: resolved stream assignment ≡
  * [[DataSplits.clusterAwareSplits]] over the unioned corpus (including
  * cross-batch MERGES — a later doc bridging two committed components
  * relabels both to the batch answer), replay idempotence (with and
  * without an intervening compaction), leak-freedom of the final
  * assignment, and the manifest law on `fractions`.
  */
class SplitStreamSpec extends SparkSpec {
  import spark.implicits._

  // Scenario with every interesting shape: batch 0 commits components
  // {10,11} (label 10) and {12}; batch 1 commits {20,21} (label 20);
  // batch 2 LOWERS a committed label (5 joins {10,11} -> redirect
  // 10->5) and BRIDGES two committed components (30 links 12 and 20 ->
  // redirect 20->12); batch 3 joins an already-merged component.
  private val batches: Seq[Seq[Long]] =
    Seq(Seq(10L, 11L, 12L), Seq(20L, 21L), Seq(5L, 30L), Seq(40L))
  private val edges: Seq[(Long, Long)] =
    Seq((10L, 11L), (20L, 21L), (5L, 10L), (30L, 12L), (30L, 20L), (40L, 5L))

  private def docsDf(ids: Seq[Long]) = ids.toDF("doc_id")

  /** Deterministic pair generator: the global edge list filtered to
    * edges whose endpoints are visible (one side in the batch, the
    * other in batch ∪ committed members) — exactly what a banding index
    * would surface, minus the machinery.
    */
  private def pairsOf(fresh: DataFrame, members: DataFrame): DataFrame = {
    val vis = fresh.select(col("doc_id"))
      .union(members.select(col("doc_id"))).distinct()
    edges.toDF("doc_a", "doc_b")
      .join(vis.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(vis.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .join(fresh.select(col("doc_id").as("k")),
        col("doc_a") === col("k") || col("doc_b") === col("k"), "left_semi")
  }

  private def batchAnswer: Map[Long, (Long, String)] = {
    val docs = docsDf(batches.flatten)
    DataSplits.clusterAwareSplits(docs, edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
  }

  private def streamed(dir: String): Map[Long, (Long, String)] =
    SplitStream.assignments(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("resolved stream assignment ≡ batch clusterAwareSplits, merges included") {
    val dir = Files.createTempDirectory("graft-splitstream").toString
    var merges = 0L
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf,
      onBatch = (_, _, _, m) => merges += m)
    batches.zipWithIndex.foreach { case (ids, i) => fn(docsDf(ids), i.toLong) }
    assert(merges == 2, s"10->5 and 20->12 are the two merge events, got $merges")
    val got = streamed(dir)
    assert(got == batchAnswer, s"stream $got vs batch $batchAnswer")
    // The merge cases specifically: docs committed in earlier batches
    // moved to the batch answer's label.
    assert(got(11L)._1 == 5L, "bridged member relabeled to the lowered min")
    assert(got(21L)._1 == 12L, "bridged component relabeled across the merge")
  }

  test("replay of a committed batch is idempotent (the merge batch, no less)") {
    val dir = Files.createTempDirectory("graft-splitreplay").toString
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf)
    batches.zipWithIndex.foreach { case (ids, i) => fn(docsDf(ids), i.toLong) }
    val before = streamed(dir)
    fn(docsDf(batches(2)), 2L) // at-least-once replay of the merge batch
    assert(streamed(dir) == before, "replay must not move any assignment")
    assert(before == batchAnswer)
  }

  test("compaction folds redirects and survives replays across the boundary") {
    val dir = Files.createTempDirectory("graft-splitcompact").toString
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf, compactEvery = 2)
    batches.zipWithIndex.foreach { case (ids, i) => fn(docsDf(ids), i.toLong) }
    // Batch 2 triggered a compaction: a single surviving generation > 0
    // holding the resolved members.
    val gens = GenStore.committed(spark, dir)
    assert(gens.nonEmpty && gens.max >= 1, s"compaction advanced the store: $gens")
    assert(streamed(dir) == batchAnswer)
    // Replay reaching back past the compaction sees resolved labels;
    // confluence keeps the assignment fixed.
    fn(docsDf(batches(2)), 2L)
    fn(docsDf(batches(1)), 1L)
    assert(streamed(dir) == batchAnswer)
  }

  test("final assignment is leak-free: no near-dup pair straddles splits") {
    val dir = Files.createTempDirectory("graft-splitleak").toString
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf)
    batches.zipWithIndex.foreach { case (ids, i) => fn(docsDf(ids), i.toLong) }
    val asg = SplitStream.assignments(spark, dir)
    val leaky = edges.toDF("doc_a", "doc_b")
      .join(asg.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(asg.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb"))
      .count()
    assert(leaky == 0L, "near-dup pairs must share a split by construction")
  }

  test("under the streaming engine: MemoryStream batches converge to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-splitengine").toString
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("doc_id").writeStream.foreachBatch(fn).start()
    try {
      batches.foreach { ids => mem.addData(ids: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(streamed(dir) == batchAnswer)
  }

  test("a different fractions layout refuses against the sealed manifest") {
    val dir = Files.createTempDirectory("graft-splitman").toString
    val fn = SplitStream.splitPipeline(dir, pairsOf = pairsOf)
    fn(docsDf(batches.head), 0L)
    val e = intercept[IllegalStateException] {
      SplitStream.splitPipeline(dir,
        fractions = Seq("train" -> 90, "test" -> 10),
        pairsOf = pairsOf)(docsDf(batches(1)), 1L)
    }
    assert(e.getMessage.contains("fractions"), e.getMessage)
    intercept[IllegalStateException] {
      SplitStream.assignments(spark, dir, Seq("train" -> 90, "test" -> 10))
    }
  }
}
