package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import graft.streaming.M4Stream

/** Serving-cost probe for [[M4Stream]]'s READ surface — the dashboard
  * tier's missing measured number (round-15 VERDICT ask #8): the
  * index tiers carry time-to-first-result rows (ServingProbe), the
  * chart state should too. The question a live dashboard asks: with
  * the stream's whole history folded into ≤ keys·buckets anchors, how
  * long is time-to-first-chart for each of the four reads — anchors
  * (draw), coarsened (zoom-out ×24), smoothed (EWMA overlay),
  * anomalies (alert panel) — and how does it scale with STATE size
  * (keys·buckets), the only axis the reads see (raw row count is
  * amortized into ingest; the reads never touch history)?
  *
  * Corpus per decade: 8 series × {1.25k, 12.5k, 125k} hourly buckets
  * (10k / 100k / 1M anchor rows), 40 raw rows per bucket delivered in
  * 10 batches. Measured: ingest (10-batch fold), then each read
  * end-to-end (count() over the full result — pessimistic: a real
  * panel reads one key's slice).
  *
  * Diagnostic main, not an operator (tools/ contract). Run:
  * `runMain graft.tools.M4Probe`.
  */
object M4Probe {

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

    val grain = 3600000000L // hourly
    println("| anchor rows | raw rows | ingest s | chart s | zoom s " +
      "| smooth s | anomaly s | gapfill s |")
    println("|---|---|---|---|---|---|---|---|")
    for (buckets <- Seq(1250L, 12500L, 125000L)) {
      val keys = 8L
      val rowsPerBucket = 40L
      val n = keys * buckets * rowsPerBucket
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-m4probe-$buckets").toString
      // 10 batches, each carrying every bucket (maximal merge
      // pressure); value varies by (key, bucket, slot) so min/max/
      // first/last all do real work.
      val batches = (0L until 10L).map { b =>
        // Column `/` on longs is DOUBLE division — integer bucket
        // arithmetic needs the explicit casts (the q_rel30 lesson).
        spark.range(0L, n / 10L).select(
          (col("id") % keys).cast("string").as("key"),
          ((col("id") / keys).cast("long") % buckets * grain +
            (col("id") / (keys * buckets)).cast("long") * 7L + b).as("ts_us"),
          ((col("id") * 13 + b * 97) % 1000 / 10.0).as("value"))
      }
      val fn = M4Stream.pipeline(dir, grain)
      val (_, tIngest) = timed {
        batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
      }
      val (nAnchors, tChart) = timed {
        M4Stream.anchors(spark, dir).count()
      }
      val (_, tZoom) = timed {
        M4Stream.coarsened(spark, dir, 24).count()
      }
      val (_, tSmooth) = timed {
        M4Stream.smoothed(spark, dir).count()
      }
      val (_, tAnom) = timed {
        M4Stream.anomalies(spark, dir).count()
      }
      val (_, tGap) = timed {
        M4Stream.gapFilled(spark, dir).count()
      }
      println(f"| $nAnchors | $n | $tIngest%.2f | $tChart%.2f | $tZoom%.2f " +
        f"| $tSmooth%.2f | $tAnom%.2f | $tGap%.2f |")
      new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new Path(dir), true)
    }
    spark.stop()
  }
}
