package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{SignatureExpressions, TextFunctions => TF}
import graft.operators.Dedup

/** NEAR-dup dedup as a STREAM — the MinHash-LSH analog of
  * [[IndexMaintenance]]'s closed index loop, and the missing streaming
  * tier above [[CurationStream]]'s EXACT content-fingerprint dedup:
  * documents arrive continuously, each micro-batch is checked against a
  * STORED signature index of every previously retained document, and
  * only novel documents pass through (and join the index).
  *
  * Semantics — GREEDY-PREFIX, the standard online dedup posture:
  *  - within a batch: min-id-canonical clusters (the batch-local pair
  *    graph resolved by [[Dedup.dupClusters]] — same rule as the batch
  *    funnel's near-dup stage);
  *  - across batches: first-arrival-wins — a doc near-dup (verified
  *    Jaccard ≥ `threshold`) of any RETAINED earlier doc is dropped. A
  *    doc similar only to a previously DROPPED doc is kept: the index
  *    holds retained docs only, so the transitive closure a batch run
  *    would compute over the full corpus is traded for bounded state
  *    (batch dupClusters over everything-ever is a re-run, not a
  *    stream). StreamingSpec pins both the one-batch ≡ batch-pipeline
  *    case and the chain case where the semantics legitimately differ.
  *
  * Index layout (two parquet tables under `indexDir`):
  *  - `bands`: (doc_id, band, bucket) — the LSH blocking keys, computed
  *    ONCE at admission by the same fused codegen generator as the
  *    batch path ([[SignatureExpressions.minhashBands]]); never
  *    recomputed for stored docs.
  *  - `toks`: (doc_id, toks) — distinct token sets for the exact
  *    Jaccard verify (candidates only, never all pairs).
  *
  * Per-batch cost: one map-side signature pass over the batch, a
  * bucket join of the batch's bands against the stored bands (at scale,
  * store `bands` partitioned by `band` so the join prunes partitions —
  * the stored side is read per batch but only candidate buckets carry
  * rows through the shuffle), and an exact verify over candidates. The
  * stored `toks` table joins only against verified candidate ids (a
  * broadcast of the batch's candidate id set at realistic batch sizes).
  * Appends write the batch's own novel rows only.
  *
  * Crash-replay (foreachBatch is at-least-once): the per-batch appends
  * are ordered survivors → toks → bands so that a replayed batch either
  * self-matches against its own fully-committed admission (Jaccard 1 —
  * absorbed idempotently) or re-admits and completes a partial one;
  * survivors may duplicate under replay but are never lost, and the
  * index always converges to findable + verifiable entries. See the
  * append-order comment in [[minhashDedupPipeline]].
  *
  * Reference seam: the reference dedups nothing (at-least-once pub is
  * its delivery floor, sensor_publish.py:46-83); this operator is part
  * of the training-data extension tier, the streaming form of DD-1/DD-2
  * over CONTENT similarity rather than message identity.
  */
object StreamingDedup {

  /** Create the empty signature index (idempotent only for a fresh
    * dir — call once before starting the stream).
    */
  def initMinhashIndex(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    Seq.empty[(Long, Int, Long)].toDF("doc_id", "band", "bucket")
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    Seq.empty[(Long, Seq[String])].toDF("doc_id", "toks")
      .write.mode("overwrite").parquet(s"$indexDir/toks")
  }

  /** The foreachBatch function: batch-local near-dup resolution, then
    * the stored-index check, then append + emit. `survivorsDir`
    * accumulates the retained (doc_id, text, ts) rows — the deduped
    * stream a downstream curation funnel consumes. `onBatch(batchId,
    * nArrived, nRetained)` is the monitoring hook.
    */
  def minhashDedupPipeline(indexDir: String, survivorsDir: String,
      numPerms: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.5, md5Parity: Boolean = false,
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        val spark = batch.sparkSession
        val arrivals = batch.select(col("doc_id"), col("text"), col("ts"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // Stage 1 — batch-local near-dup: the batch pair graph resolved
        // to min-id canonicals (identical machinery to the batch path).
        val localPairs = Dedup.minhashNearDups(arrivals, numPerms,
          bands, shingleSize, threshold, md5Parity)
        val localDrop = Dedup.dupClusters(localPairs)
          .where(col("doc_id") =!= col("cluster")).select("doc_id")
        val localKeep = arrivals.join(localDrop, Seq("doc_id"), "left_anti")
        // Stage 2 — stored-index check. Signatures for the batch's
        // local keepers (one map-side generator pass), bucket-joined
        // against the stored bands; candidates verified by exact
        // Jaccard against the stored token sets.
        val keepBanded = localKeep
          .select(col("doc_id"), posexplode(SignatureExpressions.minhashBands(
            TF.shingles(col("text"), shingleSize), numPerms, bands, md5Parity))
            .as(Seq("band", "bucket")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val storedBands = spark.read.parquet(s"$indexDir/bands")
        val cand = keepBanded
          .join(storedBands.select(col("band"), col("bucket"),
            col("doc_id").as("idx_id")), Seq("band", "bucket"))
          .select("doc_id", "idx_id").distinct()
        val batchToks = localKeep.select(col("doc_id"),
          array_distinct(TF.tokens(col("text"))).as("ta"))
        val storedToks = spark.read.parquet(s"$indexDir/toks")
          .select(col("doc_id").as("idx_id"), col("toks").as("tb"))
        val dupIds = cand.join(batchToks, "doc_id").join(storedToks, "idx_id")
          .where(round(TF.jaccard(col("ta"), col("tb")), 6) >= threshold)
          .select("doc_id").distinct()
        // CHECKPOINT the retained set BEFORE appending to the paths this
        // batch just read. persist() is NOT enough: each append below
        // fires refreshByPath on the index dir, which re-caches (=
        // discards and lazily recomputes) any cached plan scanning that
        // path — a persisted `retained` re-evaluated after the appends
        // would re-list the index WITH this batch's own rows, every doc
        // would match itself through the freshly appended toks, and the
        // survivors write would emit nothing. The eager localCheckpoint
        // truncates the plan to an RDD no path refresh can touch (the
        // IndexMaintenance pipelines pin their baselines the same way,
        // via driver-local relations — here the set is batch-sized, so
        // executor-held checkpoint blocks, freed below, beat a collect).
        val retained = localKeep.join(dupIds, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val kept = retained.count()
        def freeCheckpoint(): Unit =
          retained.queryExecution.analyzed.collectFirst {
            case lr: org.apache.spark.sql.execution.LogicalRDD =>
              lr.rdd.unpersist(blocking = false)
          }
        try {
          // Append ORDER is the crash-replay contract (foreachBatch is
          // at-least-once): survivors first, then toks, then bands —
          // the admission becomes visible to future candidate joins
          // (bands) only LAST. A replay after a full commit finds each
          // retained doc as its own index match (bands + toks, Jaccard
          // 1) and retains nothing — full batches absorb idempotently.
          // A replay after a partial commit finds no bands row, admits
          // the doc again, and completes the missing appends: the
          // survivor may duplicate (the standard at-least-once parquet
          // caveat) but is never LOST, and the index always converges
          // to a findable, verifiable entry. Bands-first would instead
          // strand docs findable-but-unverifiable, silently admitting
          // their future near-dups.
          retained.write.mode("append").parquet(survivorsDir)
          retained.select(col("doc_id"),
              array_distinct(TF.tokens(col("text"))).as("toks"))
            .write.mode("append").parquet(s"$indexDir/toks")
          keepBanded.join(retained.select("doc_id"), Seq("doc_id"), "left_semi")
            .select("doc_id", "band", "bucket")
            .write.mode("append").parquet(s"$indexDir/bands")
          onBatch(batchId, n, kept)
        } finally {
          freeCheckpoint()
          keepBanded.unpersist(blocking = false)
          arrivals.unpersist(blocking = false)
        }
      }
    }
  }
}
