package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import graft.streaming.SessionStream

/** Decade probe for [[SessionStream]] — the second per-entity store
  * (state linear in users × behavioral sessions, like
  * [[graft.streaming.CohortStream]]'s pairs): what does the per-batch
  * islands merge + hash-partitioned rewrite cost as the user count
  * scales, and does the state actually stay at sessions (not events)?
  *
  * The corpus is burst-shaped: each user emits 10 days of activity,
  * 3 bursts/day of 5 events each (50 ms apart) with bursts ≥ gap
  * apart — so 30 sessions/user by construction, 150 events/user,
  * delivered in 10 daily batches. Measured per decade (2k / 20k /
  * 200k users): committed session rows (must equal 30·users — the
  * events-to-sessions fold IS the operator), end-to-end 10-batch
  * pipeline seconds, final-generation files, and the sessions() read
  * time. The law to carry: state rows track sessions (5× compression
  * here, unbounded at higher burst density), per-batch cost tracks
  * state + batch size (the islands window is one user_id shuffle),
  * and files track ⌈rows/target⌉ so the rewrite fans out at cluster
  * scale. Diagnostic main, not an operator (tools/ contract).
  * Run: `runMain graft.tools.SessionProbe`.
  */
object SessionProbe {

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

    val gapUs = 1800000000L // 30 min
    val dayUs = 86400000000L
    println("| users | events | sessions | files | pipeline s | read s |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(2000L, 20000L, 200000L)) {
      // Day d, burst b (0..2, 4h apart), event i (0..4, 50ms apart).
      val batches = (0L until 10L).map { d =>
        spark.range(0L, n * 15).select(
          (col("id") % n).as("user_id"),
          (lit(d * dayUs) +
            expr(s"id div $n div 5") * (4 * 3600000000L) +
            expr(s"id div $n % 5") * 50000L +
            (col("id") % n) % 997).as("ts_us"),
          (col("id") % 1000 / 10.0).as("value"))
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-sessprobe-$n").toString
      var rows = 0L
      val fn = SessionStream.pipeline(dir, gapUs,
        onBatch = (_, t) => rows = t, targetRowsPerFile = 100000L)
      val (_, tPipe) = timed {
        batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
      }
      val (_, tRead) = timed {
        SessionStream.sessions(spark, dir, gapUs).count()
      }
      val hfs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gen = hfs.listStatus(new Path(dir)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("gen-"))
        .map(_.stripPrefix("gen-")).filter(_.forall(_.isDigit))
        .map(_.toLong).max
      val files = hfs.listStatus(new Path(s"$dir/gen-$gen")).toSeq
        .count(_.getPath.getName.endsWith(".parquet"))
      println(f"| $n | ${n * 150} | $rows | $files | $tPipe%.2f | $tRead%.2f |")
      hfs.delete(new Path(dir), true)
    }
    spark.stop()
  }
}
