package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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
  * EXACTLY-ONCE window rows: each batch's partials land in their own
  * `live/batch_id=` partition written with dynamic partition overwrite,
  * so a replayed batch (foreachBatch is at-least-once) REWRITES its own
  * partition with identical rows instead of appending duplicates —
  * without this, replayed partials would vanish into [[mergedWindows]]'
  * sums with no recovery path (un-dedupable double counts, the r8
  * ADVICE finding). Closed partitions are folded into sealed segments
  * every `foldWindowsEvery` batches ([[FoldStore]]) so the store's
  * directory count stays O(batches/foldEvery), not one-per-batch.
  *
  * Crash-replay of the OFFSET state: an APPEND-ONLY log of (batch_id,
  * before, after) rows under a generation dir — one row appended as
  * each batch's last effect, the highest batch_id current. Appends are
  * crash-safe where an in-place overwrite is not (overwrite deletes the
  * old state before committing the new — a crash in between loses the
  * offset entirely), so every crash point replays consistently: died
  * before the state append → the replay reads the previous batch's
  * `after`, the same offset this attempt used; died after → the replay
  * sees its OWN batch id and re-packs at `before`. Either way the
  * window GRID never shifts, and the partition overwrite above makes
  * the re-emit invisible.
  *
  * BOUNDED state: the log grows one ~24-byte row per batch, so once the
  * current generation exceeds `compactEvery` rows the pipeline compacts
  * it — the latest row is rewritten alone under generation N+1, a
  * COMMITTED marker makes the new generation resolvable (written last;
  * a crash mid-compaction leaves an unresolvable orphan and the old
  * generation stands), and older generations are then deleted. Reads
  * touch only the newest committed generation (≤ compactEvery + a few
  * rows — O(1) in stream lifetime), and a replay across the compaction
  * boundary still resolves its offset because compaction preserves the
  * newest row verbatim. Fresh-vs-existing state is decided by READING
  * the committed generation, never by inferring from file names: a
  * state dir that exists but holds no resolvable generation and is not
  * empty fails loudly instead of silently restarting the grid at
  * offset 0 (the r8 ADVICE hazard).
  */
object PackingStream {

  private val stateSchema = StructType(Seq(
    StructField("batch_id", LongType), StructField("before", LongType),
    StructField("after", LongType)))
  private val windowsSchema = StructType(Seq(
    StructField("window_id", LongType), StructField("n_docs", LongType),
    StructField("n_tokens", LongType), StructField("batch_id", LongType)))

  private def hadoopFs(spark: SparkSession, path: String) =
    GenStore.fs(spark, path)

  private def genDir(root: String, gen: Long) = GenStore.dir(root, gen)

  /** Committed generations under `offsetDir`, ascending —
    * [[GenStore]]'s protocol (a generation is resolvable only once its
    * COMMITTED marker exists).
    */
  private def committedGens(spark: SparkSession, offsetDir: String): Seq[Long] =
    GenStore.committed(spark, offsetDir)

  /** The current offset state: `None` = fresh stream (no state dir, an
    * empty one, or a committed-but-empty generation — all the shapes a
    * crash before the first state append leaves). A dir that exists
    * with content but NO resolvable generation is an ERROR: swallowing
    * it would silently restart the grid at offset 0 and overlap every
    * existing window id.
    */
  def readOffsetState(spark: SparkSession, offsetDir: String): Option[Row] = {
    val fs = hadoopFs(spark, offsetDir)
    val gens = committedGens(spark, offsetDir)
    if (gens.isEmpty) {
      // No resolvable generation. UNCOMMITTED gen-* content alone is
      // the first-batch crash window (died between the state append and
      // its marker — the replay packs at offset 0, the same placement,
      // and re-commits); anything ELSE in the dir is foreign state —
      // an offline rewrite this reader does not understand — and must
      // surface rather than silently restart the grid at offset 0.
      val foreign =
        if (!fs.exists(new Path(offsetDir))) Seq.empty
        else fs.listStatus(new Path(offsetDir)).toSeq.filterNot(s =>
          s.isDirectory && s.getPath.getName.startsWith("gen-"))
      if (foreign.nonEmpty)
        throw new IllegalStateException(
          s"offset state dir $offsetDir has non-generation content " +
            s"(${foreign.map(_.getPath.getName).mkString(", ")}) and no " +
            "committed generation — refusing to treat existing state as " +
            "a fresh stream")
      None
    } else {
      // Newest committed generation only: ≤ compactEvery + a few rows.
      spark.read.schema(stateSchema).parquet(genDir(offsetDir, gens.max))
        .orderBy(col("batch_id").desc).head(1).headOption
    }
  }

  /** One foreachBatch: pack the batch at the carried offset, rewrite
    * the batch's `batch_id=` window partition, advance the offset state
    * (compacting the log when the current generation exceeds
    * `compactEvery` rows). `onBatch(batchId, nDocs, nTokens)` is the
    * monitor hook.
    */
  def packPipeline(windowsDir: String, offsetDir: String,
      capacity: Int = 256, compactEvery: Int = 64,
      foldWindowsEvery: Int = 64,
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val arrivals = batch.select(col("doc_id"), col("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = arrivals.count()
        if (n > 0) {
          val fs = hadoopFs(spark, offsetDir)
          val gens = committedGens(spark, offsetDir)
          var gen = if (gens.isEmpty) 0L else gens.max
          val offset0 = readOffsetState(spark, offsetDir) match {
            case None => 0L
            // Replay of this very batch after its state append: reuse
            // the PRE-batch offset, reproducing the original placement
            // instead of shifting the grid forward.
            case Some(st) =>
              if (st.getLong(0) == batchId) st.getLong(1) else st.getLong(2)
          }
          // Compact BEFORE this batch's append so the new row lands in
          // the surviving generation: newest row alone → gen N+1 →
          // marker (the commit point) → drop older generations. A crash
          // anywhere in between leaves either the old generation
          // authoritative (no marker yet) or both committed (reader
          // takes the max; the stale one falls at the next compaction).
          if (gens.nonEmpty && spark.read.schema(stateSchema)
              .parquet(genDir(offsetDir, gen)).count() >= compactEvery) {
            spark.read.schema(stateSchema).parquet(genDir(offsetDir, gen))
              .orderBy(col("batch_id").desc).limit(1)
              .write.mode("overwrite").parquet(genDir(offsetDir, gen + 1))
            fs.create(new Path(s"${genDir(offsetDir, gen + 1)}/COMMITTED"),
              true).close()
            gens.foreach(g =>
              fs.delete(new Path(genDir(offsetDir, g)), true))
            gen += 1
          }
          val batchTokens = arrivals
            .agg(coalesce(sum(TF.tokenCount(col("text"))), lit(0L)))
            .head().getLong(0)
          // Fold closed window partitions into a sealed segment every
          // `foldWindowsEvery` batches ([[FoldStore]] — the window
          // store's directory count stays O(batches/foldEvery));
          // strictly below this batch's id, so the replay overwrite
          // below always lands in a live partition.
          FoldStore.maybeFold(spark, windowsDir, batchId,
            foldWindowsEvery, windowsSchema)
          // The batch's partials land in their own live partition,
          // replayed idempotently via dynamic partition overwrite (an
          // identical re-pack rewrites identical rows — never
          // duplicates). The mode is scoped to the write via the writer
          // option, never the session conf: a session-wide toggle would
          // silently change the overwrite semantics of any unrelated
          // partitioned write that races the window.
          FoldStore.writeLive(
            Packing.concatPackWindowsFrom(arrivals, capacity, offset0),
            windowsDir, batchId)
          Seq((batchId, offset0, offset0 + batchTokens))
            .toDF("batch_id", "before", "after")
            .write.mode("append").parquet(genDir(offsetDir, gen))
          // Idempotent marker (re)write AFTER the append: a first-batch
          // crash between append and marker replays as fresh (offset 0
          // — the same placement), then commits both.
          fs.create(new Path(s"${genDir(offsetDir, gen)}/COMMITTED"), true)
            .close()
          onBatch(batchId, n, batchTokens)
        }
      } finally arrivals.unpersist(blocking = false)
    }
  }

  /** Merge the partial rows of straddled windows: the consumer-side
    * view that equals a batch [[Packing.concatPackWindows]] over the
    * whole arrival sequence. Reads the full folded store — every
    * committed segment plus the live tail ([[FoldStore]]).
    */
  def mergedWindows(spark: SparkSession, windowsDir: String): DataFrame =
    FoldStore.read(spark, windowsDir, windowsSchema)
      .groupBy("window_id")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("window_id")
}
