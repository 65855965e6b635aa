package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Packing

/** Concat-and-chunk packing as a STREAM — the last hop of the streamed
  * training-data path (dedup → funnel → windows): curated documents
  * arrive continuously and pack into the SAME fixed-capacity window
  * grid a batch run would produce, because the only cross-batch state
  * is one number — the total token offset consumed so far.
  *
  * Each micro-batch packs as the next slice of one unbounded token
  * stream ([[Packing.concatPackWindowsFrom]] at the carried offset), so
  * windows straddle batch boundaries exactly as they straddle
  * documents; the rows for a straddled window are PARTIAL and merge
  * downstream by summing ([[mergedWindows]] — a doc lives in exactly
  * one batch, so n_docs sums correctly too). StreamingSpec proves
  * merged-stream ≡ one batch pack of the union.
  *
  * The offset is read before and rewritten after each batch's append —
  * driver-sequential inside foreachBatch, so there is no concurrent
  * writer by construction; crash-replay of a micro-batch re-reads the
  * PRE-batch offset (the overwrite is the batch's last effect) and
  * re-emits the same partials, which the idempotent merge absorbs as
  * duplicates only if the windows append also committed — the standard
  * at-least-once foreachBatch caveat, same as every parquet-append sink
  * in this repo.
  */
object PackingStream {

  /** One foreachBatch: pack the batch at the carried offset, append the
    * partial window rows to `windowsDir`, advance the offset in
    * `offsetDir`. `onBatch(batchId, nDocs, nTokens)` is the monitor
    * hook.
    */
  def packPipeline(windowsDir: String, offsetDir: String,
      capacity: Int = 256,
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        val spark = batch.sparkSession
        import spark.implicits._
        val offset0 = Try(spark.read.parquet(offsetDir)
          .head().getLong(0)).getOrElse(0L)
        val batchTokens = batch
          .agg(coalesce(sum(TF.tokenCount(col("text"))), lit(0L)))
          .head().getLong(0)
        Packing.concatPackWindowsFrom(batch.select("doc_id", "text"),
            capacity, offset0)
          .write.mode("append").parquet(windowsDir)
        Seq(offset0 + batchTokens).toDF("offset")
          .write.mode("overwrite").parquet(offsetDir)
        onBatch(batchId, n, batchTokens)
      }
    }

  /** Merge the partial rows of straddled windows: the consumer-side
    * view that equals a batch [[Packing.concatPackWindows]] over the
    * whole arrival sequence.
    */
  def mergedWindows(spark: SparkSession, windowsDir: String): DataFrame =
    spark.read.parquet(windowsDir)
      .groupBy("window_id")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("window_id")
}
