package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.SubstrDedupStream

/** Decade probe for [[SubstrDedupStream]]'s LSM design (round-15's top
  * VERDICT ask, measured in-round rather than next): per corpus decade
  * (5k real / 50k / 500k synthetic docs, 10 batches), the cost split
  * the fold cadence law rests on —
  *
  *   - per-batch pipeline time at foldEvery ∈ {1, 4, never}: fold
  *     every batch pays the O(distinct grams) counts rewrite per
  *     batch; folding never defers it all to the read;
  *   - spans() read time for each cadence: an unfolded read re-
  *     aggregates the whole gram log (the wordcount-shape exchange),
  *     a folded read joins the committed counts and aggregates only
  *     the tail;
  *   - state volume: gram-log rows (the positional state spans need —
  *     O(corpus tokens), append-only, never rewritten) vs the counts
  *     table (≤ distinct grams, rewritten per fold).
  *
  * Run: `runMain graft.tools.SubstrProbe`. Diagnostic main (tools/
  * contract): the operator under test never changes.
  */
object SubstrProbe {

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

    val real = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang")
    val vocab = real.select(explode(split(col("text"), " ")).as("t"))
      .distinct().orderBy("t").collect().map(_.getString(0)).toSeq

    println("| docs | foldEvery | pipeline s | spans() s | spans | " +
      "gram rows | count rows |")
    println("|---|---|---|---|---|---|---|")
    for ((name, docsRaw) <- Seq(
        "real-5k" -> real.select("doc_id", "text"),
        "synth-50k" -> ScalingProbe.synthDocs(spark, 50000, vocab)
          .select("doc_id", "text"),
        "synth-500k" -> ScalingProbe.synthDocs(spark, 500000, vocab)
          .select("doc_id", "text"))) {
      val docs = docsRaw.cache()
      val n = docs.count()
      val batches = (0 until 10).map(b =>
        docs.where(pmod(col("doc_id"), lit(10)) === b))
      for (foldEvery <- Seq(1, 4, Int.MaxValue)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-substrprobe").toString
        val fn = SubstrDedupStream.pipeline(dir, k = 8,
          foldEvery = foldEvery)
        val (_, tPipe) = timed {
          batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
        }
        val (nSpans, tSpans) = timed {
          SubstrDedupStream.spans(spark, dir).count()
        }
        // State volume: the gram log (positions, append-only) and the
        // folded counts generation (absent when folding never ran).
        val gramRows = spark.read
          .schema("doc_id LONG, pos LONG, h STRING")
          .parquet(s"$dir/grams/batch-*")
          .count()
        val countRows =
          try spark.read.schema("h STRING, n LONG")
            .parquet(s"$dir/counts/gen-*").count()
          catch { case _: Exception => 0L }
        val feLabel = if (foldEvery == Int.MaxValue) "never"
          else foldEvery.toString
        println(f"| $name ($n) | $feLabel | $tPipe%.1f | $tSpans%.2f " +
          f"| $nSpans | $gramRows | $countRows |")
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(dir), true)
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
