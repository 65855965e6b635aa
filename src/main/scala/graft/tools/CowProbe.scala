package graft.tools

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CohortStream, CowCohortStream, CowUpsertStream, UpsertStream}

/** Decade probe for the copy-on-write upsert layout: per-batch write
  * IO of [[UpsertStream]] (full state rewrite every batch) vs
  * [[CowUpsertStream]] (touched buckets only), across state decades
  * and TWO bucket counts — because the law has two regimes and the
  * probe must show both:
  *
  *   per-batch IO ≈ state · (1 − (1 − 1/B)^k) ≈ state · k/B  for a
  *   batch touching k keys spread uniformly over B buckets
  *
  * so copy-on-write wins exactly when k ≪ B (touched buckets are a
  * small fraction) and degenerates to the full rewrite when k ≳ B
  * (every bucket touched — B must be sized well above the expected
  * per-batch key spread, the way a 100 TB store would pick B ~ 64k
  * for ~10⁵-row CDC batches). The price of large B at small state is
  * small files (state/B rows per bucket file); at target scale
  * (10⁹⁺ keys) both sides of the trade are comfortable. The probe
  * runs a seed batch (all keys) then `updates` fixed-size update
  * batches, measuring per-update-batch seconds and bytes actually
  * written into each new generation, plus the read-back time of the
  * full current-row table. Diagnostic main, not an operator (tools/
  * contract). Run: `runMain graft.tools.CowProbe`.
  */
object CowProbe {

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

    def fs(path: String) = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def genDir(root: String, gen: Long): String = s"$root/gen-$gen"

    def dirBytes(path: String): Long = {
      val hfs = fs(path)
      val p = new Path(path)
      if (!hfs.exists(p)) 0L
      else {
        val it = hfs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) {
          val f = it.next()
          if (!f.getPath.getName.startsWith("_")) n += f.getLen
        }
        n
      }
    }

    import spark.implicits._
    val kTouch = 256 // keys per update batch
    val updates = 5
    def batchDf(n: Long, b: Int) = {
      // update batch b: kTouch keys spread over the space, new ts wins
      (0 until kTouch).map { i =>
        val k = (i.toLong * (n / kTouch) + b) % n
        (k, "t", 1000L + b, n + b.toLong * kTouch + i, b.toDouble)
      }.toDF("user_id", "event_type", "ts_us", "event_id", "value")
    }

    println("| keys | store | update s/batch | MB written/batch | " +
      "read s | read s post-compaction |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(100000L, 1000000L, 4000000L)) {
      val seed = spark.range(0L, n).select(col("id").as("user_id"),
        lit("t").as("event_type"), lit(0L).as("ts_us"),
        col("id").as("event_id"), lit(0.0).as("value"))

      def run(tag: String, mk: String => (org.apache.spark.sql.DataFrame,
          Long) => Unit, read: String => Long,
          compactor: Option[String => (org.apache.spark.sql.DataFrame,
            Long) => Unit]): Unit = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-cowprobe").toString
        val fn = mk(dir)
        fn(seed, 0L)
        var secs = 0.0
        var bytes = 0L
        (1 to updates).foreach { b =>
          val (_, t) = timed { fn(batchDf(n, b), b.toLong) }
          secs += t
          // count the CDC changelog dir too (CoW stores write one per
          // batch; the full-rewrite baseline doesn't) — omitting it
          // understates CoW per-batch write IO
          bytes += dirBytes(genDir(dir, b.toLong)) +
            dirBytes(s"$dir/changes/gen-$b")
        }
        val (_, tRead) = timed { read(dir) }
        // One more batch through a compacting cadence, then read again:
        // the read-amplification side of the trade is bounded by
        // compaction, and the table must show both sides.
        val tReadC = compactor.map { mkc =>
          mkc(dir)(batchDf(n, updates + 1), (updates + 1).toLong)
          timed { read(dir) }._2
        }
        println(f"| $n | $tag | ${secs / updates}%.2f | " +
          f"${bytes.toDouble / updates / 1e6}%.1f | $tRead%.2f | " +
          tReadC.map(t => f"$t%.2f").getOrElse("-") + " |")
        fs(dir).delete(new Path(dir), true)
      }

      run("full-rewrite", d => UpsertStream.pipeline(d),
        d => UpsertStream.latest(spark, d).count(), None)
      run("cow B=256",
        d => CowUpsertStream.pipeline(d, buckets = 256, compactEvery = 100),
        d => CowUpsertStream.latest(spark, d).count(),
        Some(d => CowUpsertStream.pipeline(d, buckets = 256,
          compactEvery = updates + 1L)))
      run("cow B=4096",
        d => CowUpsertStream.pipeline(d, buckets = 4096, compactEvery = 100),
        d => CowUpsertStream.latest(spark, d).count(),
        Some(d => CowUpsertStream.pipeline(d, buckets = 4096,
          compactEvery = updates + 1L)))
    }

    // ---- the cohort store: the board's per-DISTINCT-user pair log.
    // Retention-shaped corpus (CohortProbe's): a seed week of all
    // users, then weekly batches where only `active` users show up —
    // the realistic regime where batch key-spread << state keys.
    val weekUs = 604800000000L
    println()
    println("| users | active/week | store | s/batch | MB written/batch |")
    println("|---|---|---|---|---|")
    for (n <- Seq(100000L, 1000000L, 4000000L)) {
      val active = 1000L
      def weekDf(w: Long) =
        spark.range(0L, active).select(
          ((col("id") * (n / active) + w) % n).as("user_id"),
          (lit(w * weekUs) + col("id") % 1000).as("ts_us"))
      def runC(tag: String,
          mk: String => (org.apache.spark.sql.DataFrame, Long) => Unit)
          : Unit = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-cowcohprobe").toString
        val fn = mk(dir)
        val seed = spark.range(0L, n).select(col("id").as("user_id"),
          (col("id") % 1000).as("ts_us"))
        fn(seed, 0L)
        var secs = 0.0
        var bytes = 0L
        (1 to updates).foreach { w =>
          val (_, t) = timed { fn(weekDf(w.toLong), w.toLong) }
          secs += t
          bytes += dirBytes(genDir(dir, w.toLong))
        }
        println(f"| $n | $active | $tag | ${secs / updates}%.2f | " +
          f"${bytes.toDouble / updates / 1e6}%.1f |")
        fs(dir).delete(new Path(dir), true)
      }
      runC("full-rewrite", d => CohortStream.pipeline(d, weekUs))
      runC("cow B=4096",
        d => CowCohortStream.pipeline(d, weekUs, buckets = 4096,
          compactEvery = 100))
    }

    // ---- z-order inside the CoW buckets (CMP-COWZ): rows a 2-d box
    // predicate READS off the compacted store, by per-file min/max
    // pruning (exactly what parquet row-group/file stats expose), z
    // vs the plain compaction layout. 512x512 grid of current rows,
    // ts_us = x, event_id = y; box = a 64x64 rectangle (1.6% of the
    // key space).
    println()
    println("| layout | files | files hit | rows read | of rows |")
    println("|---|---|---|---|---|")
    for ((tag, z) <- Seq(
        ("plain", None),
        ("zorder rf=64", Some(graft.streaming.ZOrder(
          "ts_us", "event_id", bits = 9, rangeFiles = 64))))) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-cowzprobe").toString
      val fn = graft.streaming.CowUpsertStream.pipeline(dir, buckets = 1,
        compactEvery = 1, zOrderOn = z)
      val grid = spark.range(0L, 512L * 512L).select(
        col("id").as("user_id"), lit("g").as("event_type"),
        (col("id") / 512L).cast("long").as("ts_us"),
        pmod(col("id"), lit(512L)).as("event_id"), lit(1.0).as("value"))
      fn(grid, 0L)
      fn(grid.limit(1), 1L) // gen 1: the compacting (z-laying) write
      val files = spark.read
        .parquet(s"$dir/gen-1/bucket=0")
        .groupBy(input_file_name().as("f"))
        .agg(min("ts_us").as("xlo"), max("ts_us").as("xhi"),
          min("event_id").as("ylo"), max("event_id").as("yhi"),
          count(lit(1)).as("rows"))
        .collect()
      val hit = files.filter(r => r.getLong(1) <= 287L && r.getLong(2) >= 224L &&
        r.getLong(3) <= 287L && r.getLong(4) >= 224L)
      val total = files.map(_.getLong(5)).sum
      val read = hit.map(_.getLong(5)).sum
      println(f"| $tag | ${files.length} | ${hit.length} | $read | " +
        f"${100.0 * read / total}%.1f%% |")
      fs(dir).delete(new Path(dir), true)
    }
    spark.stop()
  }
}
