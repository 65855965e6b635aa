package graft.tools

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IndexMaintenance

/** Decade-scaling probe for the OFF-PATH rebuild's availability claim
  * (SCALE.md evidence): as the corpus grows 5k → 50k → 500k vectors
  * with the arrival batch FIXED at 200, the inline rebuild's
  * batch-path stall grows with the corpus (train + full re-encode run
  * inside the batch), while the async swap — the only work the batch
  * path ever pays — stays near-flat (staged catch-up encode of the
  * window + commit + one scan of the compact code table for the
  * baseline re-pin).
  *
  * Measured per decade, fresh identical stores for each mode:
  *  - `t_inline`: wall time of the retrain-triggering batch on an
  *    inline pipeline — the ingestion stall.
  *  - `t_build`: daemon build duration on the async pipeline (submit →
  *    codes landed), the work moved OFF the batch path.
  *  - `t_swap`: wall time of the batch that performs the swap —
  *    the async mode's worst batch, the number that must not grow
  *    with the corpus.
  *
  * Diagnostic main, not an operator: `runMain graft.tools.AsyncSwapProbe`.
  */
object AsyncSwapProbe {

  /** The spec fixtures' distribution pair, at dim 32: `shifted = false`
    * is the small-value base pattern the store trains on;
    * `shifted = true` is the alternating ±5 pattern AsyncRebuildSpec
    * proves trips the retrain signal (a half-dim additive shift does
    * NOT — the fit barely moves; measured retrain=0).
    */
  def synthVecs(spark: SparkSession, ids: Range, shifted: Boolean): DataFrame =
    spark.range(ids.start, ids.end).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)), j =>
        if (shifted)
          when(pmod(col("id") + j, lit(2)) === 0, lit(5.0f)).otherwise(lit(-5.0f))
        else
          pmod(col("id") + j, lit(13)).cast("float") * lit(0.1f) - lit(0.5f))
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    // All three generation-store tiers share the protocol; each decade
    // row measures one tier on fresh identical stores per mode. The
    // IVF-PQ rebuild is the most expensive (two trainings + two corpus
    // passes) — exactly the tier where the off-path stance matters most.
    val tiers: Seq[(String,
        (String, DataFrame) => Unit,
        (String, String, Boolean, (Long, Long) => Unit)
          => (DataFrame, Long) => Unit)] = Seq(
      ("int8",
        (root, corpus) => IndexMaintenance.initInt8Store(spark, root, corpus,
          nCentroids = 16, lloydIters = 2, trainN = 4096, seedPlanes = 6,
          dim = 32),
        (root, sink, async, onReb) =>
          IndexMaintenance.int8RebuildingPipeline(spark, root, sink,
            nCentroids = 16, lloydIters = 2, trainN = 4096, seedPlanes = 6,
            dim = 32, async = async, onRebuild = onReb)),
      ("pq",
        (root, corpus) => IndexMaintenance.initPqStore(spark, root, corpus,
          m = 4, ksub = 16, iters = 2, trainN = 1024, dim = 32),
        (root, sink, async, onReb) =>
          IndexMaintenance.pqRebuildingPipeline(spark, root, sink,
            m = 4, ksub = 16, iters = 2, trainN = 1024, dim = 32,
            async = async, onRebuild = onReb)),
      ("ivfpq",
        (root, corpus) => IndexMaintenance.initIvfPqStore(spark, root, corpus,
          nCentroids = 16, m = 4, ksub = 16, lloydIters = 2, trainN = 1024,
          seedPlanes = 6, dim = 32),
        (root, sink, async, onReb) =>
          IndexMaintenance.ivfPqRebuildingPipeline(spark, root, sink,
            nCentroids = 16, m = 4, ksub = 16, lloydIters = 2, trainN = 1024,
            seedPlanes = 6, dim = 32, async = async, onRebuild = onReb)))
    for ((tier, init, pipeline) <- tiers; n <- Seq(5000, 50000, 500000)) {
      def freshStore(tag: String): String = {
        val root = Files.createTempDirectory(s"graft-swapprobe-$tier-$tag").toString
        init(root, synthVecs(spark, 0 until n, shifted = false))
        root
      }
      val window = 200 // fixed arrival batch — the async swap's only O(·)
      // INLINE: the retrain-triggering batch carries the full rebuild.
      val rootI = freshStore("inline")
      val sinkI = Files.createTempDirectory("graft-swapprobe-sinki").toString
      var inlineRebuilt = false
      val fnI = pipeline(rootI, sinkI, false,
        (_, _) => inlineRebuilt = true)
      val tInline = time(
        fnI(synthVecs(spark, n until (n + window), shifted = true), 0L))
      require(inlineRebuilt,
        s"$tier n=$n: the shifted batch must trip the retrain")
      // ASYNC: same store shape; the triggering batch submits, the
      // daemon builds, the NEXT batch swaps.
      val rootA = freshStore("async")
      val sinkA = Files.createTempDirectory("graft-swapprobe-sinka").toString
      val fnA = pipeline(rootA, sinkA, true, (_, _) => ())
      val t0 = System.nanoTime()
      fnA(synthVecs(spark, n until (n + window), shifted = true), 0L) // submit
      // Build completion: the codes table's _SUCCESS is the builder's
      // last write in every tier's write*Gen; the built-flag store
      // follows within microseconds. Bounded poll — a build that never
      // lands (signal not tripped, or a builder failure) must fail the
      // probe loudly, not hang it.
      val codesOk = new Path(s"$rootA/gen-1/codes/_SUCCESS")
      val buildDeadline = System.nanoTime() + 1800L * 1000 * 1000 * 1000
      while (!fs.exists(codesOk) && System.nanoTime() < buildDeadline)
        Thread.sleep(100)
      require(fs.exists(codesOk), s"$tier n=$n: async build did not land")
      val tBuild = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val tSwap = time(
        fnA(synthVecs(spark, (n + window) until (n + 2 * window),
          shifted = true), 1L))
      println(f"[swap-probe] tier=$tier%-5s n=$n%7d window=$window " +
        f"t_inline=$tInline%6.2fs t_build=$tBuild%6.2fs t_swap=$tSwap%6.2fs " +
        f"stall_ratio=${tInline / tSwap}%5.1fx")
    }
    spark.stop()
  }
}
