package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** The curation funnel's front stages as a STREAM — the kappa claim
  * applied to training data: documents arrive continuously (crawl
  * output, user uploads), and the same content-hash dedup + quality
  * gate the batch funnel proves (q_ml9) runs incrementally, so the
  * curated store is always current and a batch re-run over the sink
  * reproduces the batch funnel's survivors.
  *
  * State posture at scale: cross-batch dedup keys on the md5 content
  * fingerprint under an event-time watermark
  * (`dropDuplicatesWithinWatermark`), so the state store holds only the
  * watermark window's fingerprints — bounded by arrival rate, not
  * corpus size (an unbounded-retention dedup would grow state forever;
  * a pipeline needing exact all-time dedup instead joins the sink's
  * fingerprint index per micro-batch, trading state for an id-keyed
  * lookup). The quality gate is stateless per-row arithmetic (same
  * rounded expressions as q_txt4/q_ml9, so stream and batch agree
  * exactly on the keep decision).
  */
object CurationStream {

  /** docs: streaming (doc_id, text, ts). Returns the curated stream:
    * watermarked content dedup, then the q_ml9 quality gate
    * (token count ≥ `minTokens`, unique-token ratio ≥ `minUniq`).
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
}
