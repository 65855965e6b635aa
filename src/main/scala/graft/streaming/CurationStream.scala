package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Curation as a STREAM — the kappa claim (reference README.md:5)
  * applied to training data: documents arrive continuously (crawl
  * output, user uploads) and hygiene runs incrementally instead of as
  * nightly batch jobs.
  *
  * Two entry points:
  *  - [[curationStream]]: the front stages — watermarked
  *    content-fingerprint dedup composed with a standalone STATELESS
  *    quality gate (minimum token count + unique-token ratio). This is
  *    NOT the q_ml9 funnel: the batch funnel's dedup keeps the MIN doc
  *    id per fingerprint where the stream keeps the FIRST ARRIVAL
  *    (equal exactly when ingest order is id order), and its sampling
  *    stage needs corpus-wide state. Batch-reproducibility holds for
  *    the dedup+gate subset only.
  *  - [[curationFunnelStream]]: the FULL q_ml9 stage sequence — dedup →
  *    benchmark-gram decontamination → temperature-flattened sampling —
  *    with the two corpus-wide inputs pinned as parameters (the bench
  *    gram set; the quality extrema), which is how a production stream
  *    runs them: calibration comes from a reference snapshot and is
  *    refreshed on retrain, not recomputed per row. Given the batch
  *    run's own calibration and id-ordered arrival, stream and batch
  *    keep the same survivor set (StreamingSpec proves it cross-batch
  *    with a late duplicate).
  *
  * State posture at scale: the ONLY stateful stage is the cross-batch
  * dedup, keyed on the md5 content fingerprint under an event-time
  * watermark (`dropDuplicatesWithinWatermark`), so the state store
  * holds just the watermark window's fingerprints — bounded by arrival
  * rate, not corpus size (an unbounded-retention dedup would grow state
  * forever; a pipeline needing exact all-time dedup instead joins the
  * sink's fingerprint index per micro-batch, trading state for an
  * id-keyed lookup). Every other stage is per-row arithmetic.
  */
object CurationStream {

  /** docs: streaming (doc_id, text, ts). Returns the curated stream:
    * watermarked content dedup (first arrival per fingerprint within
    * the window), then a stateless quality gate (token count ≥
    * `minTokens`, unique-token ratio ≥ `minUniq` — the same rounded
    * ratio arithmetic q_txt4 oracles, so gate decisions are
    * reproducible engine-over-engine).
    */
  def curationStream(docs: DataFrame, watermark: String = "10 minutes",
      minTokens: Int = 8, minUniq: Double = 0.3): DataFrame = {
    val toks = TF.tokens(col("text"))
    docs
      .withColumn("fp", TF.fingerprintMd5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .where(TF.tokenCount(col("text")) >= minTokens &&
        round(size(array_distinct(toks)).cast("double") /
          size(toks).cast("double"), 6) >= minUniq)
      .select(col("doc_id"), col("text"), col("ts"))
  }

  /** The full q_ml9 funnel over a stream of (doc_id, text, ts):
    *
    *  1. watermarked content-fingerprint dedup (stateful; first arrival
    *     kept — equals the batch min-id pick when ingest order is id
    *     order, the monotonic-id property every log pipeline has);
    *  2. 8-gram benchmark decontamination: drop any doc sharing an
    *     n-gram with `benchGrams`. The gram set is broadcast once and
    *     probed per row — the MAP SIDE of q_ml7's broadcast hash join,
    *     expressed as a closure over the broadcast handle because a
    *     join would need a per-doc aggregate (stateful) to go from
    *     gram-level matches back to a doc-level decision, while the
    *     per-row set probe is stateless and exactly equivalent;
    *  3. temperature-flattened sampling with PINNED calibration
    *     (`qMin`, `qMax`): keep iff u < ((q−qMin)/(qMax−qMin))^invTemp,
    *     u the deterministic md5-prefix draw — the identical rounded
    *     expressions as q_ml8/q_ml9, so given the batch extrema the
    *     stream's keep decisions match the batch sampler's bit-for-bit.
    *     Degenerate calibration (qMax == qMin) keeps everything
    *     explicitly, same guard as the batch side. Unlike the batch
    *     sampler — whose extrema come from the very corpus it scores, so
    *     scores are in-range by construction — a STREAMED doc can drift
    *     outside the pinned calibration; the normalized quality is
    *     clamped to [0,1] before pow, so q < qMin ⇒ p = 0 (always
    *     dropped) and q > qMax ⇒ p = 1 (always kept). Without the clamp,
    *     q < qMin with invTemp = 0.5 yields pow(neg, 0.5) = NaN and
    *     Spark's NaN ordering makes `u < NaN` TRUE — the worst
    *     out-of-calibration docs would always be kept, the opposite of
    *     the sampler's intent.
    *
    * Scale: stage 2's probe is O(grams(doc)) per row against an
    * executor-local hash set (bench suites are small — millions of
    * grams at most, the same size class the batch side broadcasts);
    * stages 2-3 are map-only, so the stream's per-batch cost is the
    * dedup shuffle alone.
    */
  def curationFunnelStream(docs: DataFrame, benchGrams: Set[String],
      qMin: Double, qMax: Double, watermark: String = "10 minutes",
      gramN: Int = 8, invTemp: Double = 0.5): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(benchGrams)
    val contaminated = udf((grams: Seq[String]) => grams.exists(bc.value.contains))
    val p =
      if (qMax == qMin) lit(1.0)
      else round(pow(least(greatest(
        (TF.qualityScore(col("text")) - lit(qMin)) / lit(qMax - qMin),
        lit(0.0)), lit(1.0)), invTemp), 6)
    val u = round(TF.hexHash60(col("text")).cast("double") /
      lit(1152921504606846976.0), 6)
    docs
      .withColumn("fp", TF.fingerprintMd5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .where(!contaminated(TF.shingles(col("text"), gramN)))
      .where(u < p)
      .select(col("doc_id"), col("text"), col("ts"))
  }
}
