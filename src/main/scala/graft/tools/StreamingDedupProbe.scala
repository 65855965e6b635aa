package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SignatureExpressions, TextFunctions => TF}
import graft.streaming.StreamingDedup

/** Decade-scaling probe for the streamed near-dup dedup's per-batch
  * cost claim (SCALE.md round 9: O(batch + touched partitions), with a
  * documented graceful degeneration to a full scan when the batch's
  * key set saturates the partition grid). The index is seeded DIRECTLY
  * at 5k → 50k → 500k docs (the same band/toks layout the pipeline's
  * admissions write — bulk-seeding through the pipeline would time the
  * build, not the serve), then novel-doc batches of two sizes are
  * timed:
  *
  *  - batch = 4: 4·16 = 64 (band, bucket) pairs against a 16·64 = 1024
  *    leaf grid — the PRUNED regime; per-batch time should stay
  *    near-flat as the index decades.
  *  - batch = 128: 2048 pairs saturate the grid — the documented
  *    degenerate regime; per-batch time follows the index (the full
  *    bands scan the batch genuinely needs).
  *
  * Run: `runMain graft.tools.StreamingDedupProbe`. Diagnostic main,
  * not an operator.
  */
object StreamingDedupProbe {

  /** Novel docs with disjoint per-id vocabularies (no near-dups, so
    * every batch pays the full check path and appends).
    */
  def synthDocs(spark: SparkSession, ids: Range): DataFrame =
    spark.range(ids.start, ids.end).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(19)),
        j => concat(lit("d"), col("id"), lit("w"), j))).as("text"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))

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
    val (numPerms, bands, shingle, bucketSlots, idSlots) = (64, 16, 3, 64, 64)
    for (n <- Seq(5000, 50000, 500000)) {
      val idx = Files.createTempDirectory(s"graft-sdprobe-idx").toString
      val out = Files.createTempDirectory(s"graft-sdprobe-out").toString
      StreamingDedup.initMinhashIndex(spark, idx, numPerms = numPerms,
        bands = bands, shingleSize = shingle, bucketSlots = bucketSlots,
        idSlots = idSlots)
      // Seed the committed gen-0 tables in the COMPACTED layout (one
      // file per leaf via repartition on the partition keys — the
      // post-compaction steady state). The first probe build seeded
      // 8 writer-files per leaf (~8k files) and every per-batch read
      // paid a ~40 s LISTING, swamping the signal — an accidental
      // live demonstration of the small-file disease the compaction
      // trigger exists to cure, recorded in SCALE.md.
      val docs = synthDocs(spark, 0 until n)
      docs.select(col("doc_id"),
          posexplode(SignatureExpressions.minhashBands(
            TF.shingles(col("text"), shingle), numPerms, bands,
            md5Parity = false)).as(Seq("band", "bucket")))
        .withColumn("pslot", pmod(col("bucket"), lit(bucketSlots)).cast("int"))
        .repartition(col("band"), col("pslot"))
        .write.partitionBy("band", "pslot").mode("append")
        .parquet(s"$idx/gen-0/bands")
      docs.select(col("doc_id"),
          array_distinct(TF.tokens(col("text"))).as("toks"))
        .withColumn("tslot", pmod(col("doc_id"), lit(idSlots)).cast("int"))
        .repartition(col("tslot"))
        .write.partitionBy("tslot").mode("append")
        .parquet(s"$idx/gen-0/toks")
      val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
        numPerms = numPerms, bands = bands, shingleSize = shingle,
        bucketSlots = bucketSlots, idSlots = idSlots,
        compactAtFiles = Int.MaxValue)
      // Timed novel batches: warm rep then two measured per size.
      var next = n + 1000
      def batchTime(sz: Int): Double = {
        val ts = (1 to 3).map { rep =>
          val t = time(fn(synthDocs(spark, next until (next + sz)), rep.toLong))
          next += sz
          t
        }
        ts.drop(1).min
      }
      val tSmall = batchTime(4)
      val tLarge = batchTime(128)
      println(f"[sdedup-probe] n=$n%7d t_batch4=$tSmall%6.2fs " +
        f"t_batch128=$tLarge%6.2fs")
    }
    spark.stop()
  }
}
