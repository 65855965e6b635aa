package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Decade-scaling probe for the window-prep family (SCALE.md evidence):
  * chunk fan-out and end-to-end time for [[Packing.tokenChunks]] and
  * [[Packing.concatPackWindows]] at 5k (sf0.1-equivalent), 50k, and
  * 500k synthetic documents — two decades, enough to see whether the
  * map-side chunker stays linear and whether the two-level prefix sum's
  * bucket stage ever surfaces.
  *
  * Synthetic docs mirror ScalingProbe's deterministic generator
  * (xxhash64-keyed, length uniform 10..100 tokens). Run:
  * `runMain graft.tools.PackingProbe`.
  *
  * Diagnostic main, not an operator: counts are driver-printed; the
  * operators themselves never collect.
  */
object PackingProbe {
  def synthDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(0), (pmod(xxhash64(col("id")), lit(91)) + 9).cast("int")),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(997)))))
        .as("text"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (n <- Seq(5000L, 50000L, 500000L)) {
      val docs = synthDocs(spark, n).persist()
      docs.count() // exclude generation from the timed region
      // warm + measured rep each
      for (rep <- 1 to 2) {
        val (chunks, tc) = time(Packing.tokenChunks(docs).count())
        val (windows, tp) = time(Packing.concatPackWindows(docs).count())
        if (rep == 2)
          println(f"[packing-probe] n=$n%7d chunks=$chunks%9d t_chunk=$tc%6.2fs " +
            f"windows=$windows%8d t_pack=$tp%6.2fs")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
