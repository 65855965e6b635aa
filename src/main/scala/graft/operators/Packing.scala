package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Pretraining-window preparation: fixed-window document chunking and
  * concat-and-chunk sequence packing — the two ops that turn a curated
  * document table into model-ready training windows.
  *
  * Reference seam: none (the reference stops at log analytics); these
  * belong to the training-data extension tier next to the dedup/
  * curation family, downstream of q_ml9's survivors.
  */
object Packing {

  /** Fixed-window token chunking with overlap: each document's token
    * stream is cut at starts 0, stride, 2·stride, … (< n), each chunk
    * spanning up to `window` tokens (stride < window ⇒ the standard
    * overlapping-context windows; the final chunk is the natural
    * remainder, never padded). One output row per chunk: (`doc_id`,
    * `chunk_idx`, `n_tokens`, `chunk_md5`) — the md5 is over the
    * space-rejoined chunk text, so the digest pins chunk CONTENT and
    * boundaries exactly, not just counts.
    *
    * Scale: map-side only — a per-row `sequence` + `posexplode` over
    * start offsets and a `slice` per chunk; no shuffle, no UDF, and the
    * fan-out is n/stride rows per doc (bounded by document length, not
    * corpus size). Catalyst keeps the whole thing in one
    * WholeStageCodegen span over the scan.
    */
  def tokenChunks(docs: DataFrame, window: Int = 32,
      stride: Int = 24): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0),
          ((col("n") - 1) / stride).cast("int") * stride, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(window), col("n") - col("start")).cast("long").as("n_tokens"),
        md5(array_join(slice(col("toks"), col("start") + 1, lit(window)), " "))
          .as("chunk_md5"))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * id order into one token stream, and the stream is split into
    * fixed-`capacity` windows (the padding-free packing pretraining
    * pipelines use — no bin-packing heuristics, deterministic, and a
    * doc may straddle two windows). Output one row per window:
    * (`window_id`, `n_docs` = documents contributing ≥ 1 token,
    * `n_tokens` = capacity everywhere except the final partial window).
    *
    * The token OFFSET of each document is a prefix sum — the scale
    * trap: `sum().over(Window.orderBy(...))` with no partition key
    * funnels the whole table through ONE task. Computed here as the
    * classic two-level parallel prefix sum instead: docs bucket by id
    * range, per-bucket token totals aggregate map-side (`buckets` rows),
    * the bucket-offset running sum is a window over those `buckets`
    * rows only (driver-trivial), and the intra-bucket running sum is a
    * window PARTITIONED by bucket — every per-row pass is parallel, and
    * the only global ordering ever materialized is over `buckets` rows.
    * The DuckDB oracle computes the same offsets with a plain
    * single-sequence window, so the correctness gate doubles as a proof
    * the two-level sum equals the sequential one.
    */
  def concatPackWindows(docs: DataFrame, capacity: Int = 256,
      buckets: Int = 32,
      tokenCount: Column => Column = TF.tokenCount): DataFrame =
    concatPackWindowsFrom(docs, capacity, 0L, buckets, tokenCount)

  /** [[concatPackWindows]] with the token stream starting at
    * `startOffset` instead of 0 — the streaming form's continuation
    * point: a micro-batch packs its documents as the NEXT slice of one
    * unbounded stream, so windows straddle batch boundaries exactly as
    * they straddle documents. Rows for a window split across calls are
    * PARTIAL and merge downstream by summing (a document lives in
    * exactly one call, so n_docs sums correctly too) —
    * [[graft.streaming.PackingStream]] carries the offset, and the
    * merged stream equals one batch pack of the union WHEN ids arrive
    * in nondecreasing order across calls (within a call this orders by
    * doc_id; across calls the order is the caller's). Out-of-order
    * arrival still packs a valid token-conserving grid, just not the
    * id-sorted one.
    */
  def concatPackWindowsFrom(docs: DataFrame, capacity: Int,
      startOffset: Long, buckets: Int = 32,
      tokenCount: Column => Column = TF.tokenCount): DataFrame = {
    require(capacity >= 1 && buckets >= 1,
      s"need capacity >= 1 and buckets >= 1, got $capacity/$buckets")
    require(startOffset >= 0, s"startOffset must be >= 0, got $startOffset")
    // `tokenCount` is the pluggable token METER (default: whitespace
    // count; [[graft.functions.Subword.textCount]] for a trained merge
    // table) — the packing math downstream only ever sees `n`, so any
    // deterministic long-valued meter preserves the stream ≡ batch law.
    //
    // CHECKPOINTED eagerly (the pageRankTop pattern, registered for
    // harness-side freeing): the plan below references `counted` four
    // times (the max-id pass + three consumers of the bucketing), and
    // AQE does not reuse repeated pipeline subtrees — lazy, every
    // reference re-scanned the corpus and re-ran the meter (4 corpus
    // scans; PlanAuditSpec q_ml14 caught it under the subword meter).
    // The checkpoint holds only (doc_id, n) — 16 bytes/row, always a
    // tiny fraction of the corpus it meters.
    val counted = graft.util.ScratchCheckpoints.register(docs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
      .localCheckpoint())
    val maxId = counted.agg(max("doc_id").as("max_id"))
    // `div` is true integer division on longs. Spark's `/` (and
    // floor-of-`/`) goes through double and loses exactness past 2^53 —
    // and the streaming continuation is precisely the path where
    // offsets and ids grow without bound, while the DuckDB oracle's
    // `//` stays exact. Every quotient here is div for that reason.
    val bucketed = counted.crossJoin(broadcast(maxId))
      .withColumn("width", expr(s"(max_id + $buckets) div $buckets"))
      .withColumn("bucket", expr("doc_id div width"))
      .drop("max_id", "width")
    val bucketTotals = bucketed.groupBy("bucket").agg(sum("n").as("bn"))
    val wBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketOffsets = bucketTotals
      .withColumn("boff", sum("bn").over(wBuckets) - col("bn"))
      .select("bucket", "boff")
    val wIntra = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed
      .withColumn("cum", sum("n").over(wIntra))
      .join(broadcast(bucketOffsets), "bucket")
      .select(col("doc_id"), col("n"),
        (lit(startOffset) + col("boff") + col("cum") - col("n")).as("start"))
      .withColumn("end", col("start") + col("n") - 1)
    offsets
      .select(col("doc_id"), col("n"), col("start"), col("end"),
        explode(sequence(expr(s"start div $capacity"),
          expr(s"end div $capacity"))).as("window_id"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("end"), (col("window_id") + 1) * capacity - 1)
          - greatest(col("start"), col("window_id") * capacity) + 1)
          .as("n_tokens"))
      .orderBy("window_id")
  }
}
