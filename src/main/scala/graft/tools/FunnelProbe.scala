package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import graft.streaming.FunnelStream

/** Decade probe for [[FunnelStream]]'s per-entity state — the second
  * store on the board linear in DISTINCT users (after CohortStream),
  * and the one whose size depends on ARRIVAL order: chain-ordered
  * arrivals keep ≤ steps rows/user, orphaned tails (a user's later
  * steps arriving before their signup) are held below the undefined
  * chain until the head lands.
  *
  * Corpus per decade (5k / 50k / 500k users, 6 events/user, 10
  * batches), two regimes:
  *   - **ordered**: each user's whole history in one batch (the
  *     common shape) — state must sit at exactly 4 rows/user from
  *     that batch on;
  *   - **adversarial**: batches 0–8 deliver ONLY tail events
  *     (views/clicks/purchases), batch 9 delivers every signup — the
  *     orphan log peaks at ~5 rows/user (all tails retained), then
  *     one batch collapses it to the chain.
  * Measured: end-to-end pipeline seconds, peak and final retained
  * rows, and the funnel() read. The law the table carries: per-batch
  * cost is ONE groupBy(user) over bounded state + batch (the chain
  * recompute is a per-row array expression), and the state bound is
  * structural, not statistical — the adversarial peak is exactly the
  * delivered-tail count and one head batch drains it.
  *
  * Diagnostic main, not an operator (tools/ contract). Run:
  * `runMain graft.tools.FunnelProbe`.
  */
object FunnelProbe {

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

    // 6 events per user: signup@100, views@200/300, clicks@250/400,
    // purchase@500 (plus per-user jitter) — every chain completes.
    def events(spark: SparkSession, users: Long) = {
      val u = col("id")
      spark.range(0L, users).select(
        u.as("user_id"),
        array(
          struct(lit("signup").as("t"), (lit(100L) + u % 7).as("ts")),
          struct(lit("view").as("t"), (lit(200L) + u % 7).as("ts")),
          struct(lit("view").as("t"), (lit(300L) + u % 7).as("ts")),
          struct(lit("click").as("t"), (lit(250L) + u % 7).as("ts")),
          struct(lit("click").as("t"), (lit(400L) + u % 7).as("ts")),
          struct(lit("purchase").as("t"), (lit(500L) + u % 7).as("ts"))
        ).as("evs"))
        .select(col("user_id"), explode(col("evs")).as("e"))
        .select(col("user_id"), col("e.t").as("event_type"),
          col("e.ts").as("ts_us"))
    }

    println("| users | regime | pipeline s | peak rows | final rows | read s |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(5000L, 50000L, 500000L)) {
      val ev = events(spark, n).localCheckpoint()
      for (regime <- Seq("ordered", "adversarial")) {
        val batches: Seq[org.apache.spark.sql.DataFrame] =
          if (regime == "ordered")
            (0L until 10L).map(b => ev.where(col("user_id") % 10 === b))
          else
            (0L until 9L).map(b => ev.where(col("event_type") =!= "signup" &&
              (col("user_id") * 31 + col("ts_us")) % 9 === b)) :+
              ev.where(col("event_type") === "signup")
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-funnelprobe-$n-$regime").toString
        var peak = 0L
        var fin = 0L
        val fn = FunnelStream.pipeline(dir,
          onBatch = (_, t) => { peak = math.max(peak, t); fin = t },
          targetRowsPerFile = 100000L)
        val (_, tPipe) = timed {
          batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
        }
        val (summary, tRead) = timed {
          FunnelStream.funnel(spark, dir).collect()
        }
        val s4 = summary.find(_.getString(0) == "4_purchase").get.getLong(1)
        require(s4 == n, s"probe bug: $s4 of $n users converted")
        println(f"| $n | $regime | $tPipe%.2f | $peak | $fin | $tRead%.2f |")
        new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(new Path(dir), true)
      }
    }
    spark.stop()
  }
}
