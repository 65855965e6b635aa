package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * one batch, so n_docs sums correctly too). StreamingDedupSpec proves
  * merged-stream ≡ one batch pack of the union — a claim that holds
  * when doc ids arrive in nondecreasing order across batches (the
  * monotonic-id ingest property every log pipeline has, the same
  * assumption [[CurationStream.curationFunnelStream]]'s dedup
  * equivalence documents): within a batch the packer orders by doc_id,
  * across batches the order is arrival. Out-of-order arrivals still
  * pack a valid, token-conserving grid — just not the id-sorted batch
  * grid.
  *
  * Crash-replay (foreachBatch is at-least-once): the offset state is an
  * APPEND-ONLY log of (batch_id, before, after) rows — one appended as
  * each batch's last effect, the highest batch_id current. Appends are
  * crash-safe where an overwrite is not (overwrite deletes the old
  * state before committing the new — a crash in between loses the
  * offset entirely), so every crash point replays consistently: died
  * before the state append → the replay reads the previous batch's
  * `after`, the same offset this attempt used; died after → the replay
  * sees its OWN batch id and re-packs at `before`. Either way the
  * window GRID never shifts. What replay cannot undo is a windows
  * append that already committed: duplicated partial rows, the
  * standard at-least-once caveat of every parquet-append sink in this
  * repo (dedupe by rewriting the batch's partials to a
  * batch-id-partitioned sink if the consumer needs exactly-once). The
  * log grows one ~24-byte row per batch; compact it offline if a
  * stream lives long enough to care.
  */
object PackingStream {

  /** One foreachBatch: pack the batch at the carried offset, append the
    * partial window rows to `windowsDir`, advance the offset state in
    * `offsetDir`. `onBatch(batchId, nDocs, nTokens)` is the monitor
    * hook.
    */
  def packPipeline(windowsDir: String, offsetDir: String,
      capacity: Int = 256,
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val arrivals = batch.select(col("doc_id"), col("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = arrivals.count()
        if (n > 0) {
          // Missing/empty state dir = a fresh stream (offset 0; also
          // the crash-mid-first-append replay, where nothing committed
          // yet). An EXISTING state that fails to READ is a real error
          // and must surface — swallowing it would silently restart
          // the grid at offset 0 and overlap every existing window id.
          val fs = new Path(offsetDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val offset0 =
            if (!fs.exists(new Path(offsetDir)) ||
                fs.listStatus(new Path(offsetDir))
                  .forall(!_.getPath.getName.endsWith(".parquet"))) 0L
            else {
              val st = spark.read.parquet(offsetDir)
                .orderBy(col("batch_id").desc)
                .select("batch_id", "before", "after").head()
              // Replay of this very batch after its state append:
              // reuse the PRE-batch offset, reproducing the original
              // placement instead of shifting the grid forward.
              if (st.getLong(0) == batchId) st.getLong(1) else st.getLong(2)
            }
          val batchTokens = arrivals
            .agg(coalesce(sum(TF.tokenCount(col("text"))), lit(0L)))
            .head().getLong(0)
          Packing.concatPackWindowsFrom(arrivals, capacity, offset0)
            .write.mode("append").parquet(windowsDir)
          Seq((batchId, offset0, offset0 + batchTokens))
            .toDF("batch_id", "before", "after")
            .write.mode("append").parquet(offsetDir)
          onBatch(batchId, n, batchTokens)
        }
      } finally arrivals.unpersist(blocking = false)
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
