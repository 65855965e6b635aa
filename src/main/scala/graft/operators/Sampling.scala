package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bottom-k (min-wise) deterministic sampling — the distributed
  * uniform-sample primitive (Cohen & Kaplan 2007's bottom-k sketches;
  * the min-wise family MinHash itself belongs to): rank every row by a
  * salted content hash and keep the k smallest. Three properties make
  * this THE corpus-sampling plan at 100 TB, where Bernoulli sampling
  * (q_ml3/q_ml8's per-row coin flips) cannot give them:
  *
  *  - EXACT size: always exactly min(k, n) rows, not a binomial draw.
  *  - MERGEABLE: bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) —
  *    per-partition partial top-k's merge losslessly, which is also
  *    why Spark executes it as `TakeOrderedAndProject` (map-side heaps
  *    of size ≤ k; the exchange carries k·partitions rows, never the
  *    corpus) and why a streamed form keeps exact uniformity with a
  *    k-row state ([[graft.streaming.SampleStream]]).
  *  - NESTED / COORDINATED: the k-sample is a prefix of the 2k-sample
  *    (grow a sample without resampling), and two corpora sampled
  *    under the same salt pick the SAME shared rows (coordinated
  *    sampling — overlap estimates compose).
  *
  * The rank hash is the md5-parity [[TextFunctions.hexHash60]] over
  * "salt:key", so samples are reproducible run-over-run, engine-over-
  * engine (the DuckDB oracle replays the exact ranks), and
  * independent across salts.
  */
object Sampling {

  /** The rank of `key` under `salt`: uniform 60-bit md5 integer. */
  def rank(key: Column, salt: String): Column =
    TextFunctions.hexHash60(concat_ws(":", lit(salt), key))

  /** WEIGHTED bottom-k (Efraimidis–Spirakis 2006, "Weighted random
    * sampling with a reservoir", in its deterministic-draw form): each
    * row draws u from its salted content hash and ranks by
    * −ln(u)/w — the exponential-sort equivalence: the k smallest keys
    * are a without-replacement sample where row i is drawn with
    * probability proportional to w_i at each step. With w = token
    * count this is THE training-data sampler: uniform over TOKENS
    * while emitting whole documents. Same mergeable/coordinated
    * properties as [[bottomK]] (the key depends only on the row, so
    * partial top-k's merge losslessly and equal-salt samples
    * coordinate); compiles to `TakeOrderedAndProject`.
    *
    * Determinism discipline: u = (h60 + 1) / 2⁶⁰ ∈ (0, 1] (the +1
    * keeps ln away from 0 — Spark's ln(0) is NULL while DuckDB's
    * errors, so the open interval is load-bearing, not cosmetic); the
    * key is rounded to 6dp before ranking with the row key as
    * tie-break (the q_ml20 pow discipline — ln/division are the one
    * 1-ulp cross-engine risk, absorbed by the rounding). Rows with
    * w ≤ 0 carry no sampling mass and are dropped.
    */
  def weightedBottomK(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = "wsmp"): DataFrame = {
    require(k > 0, s"sample size must be positive, got k=$k")
    import org.apache.spark.sql.expressions.Window
    val u = (rank(col(keyCol), salt) + 1).cast("double") /
      1152921504606846976.0e0
    val ranked = df.where(col(weightCol) > 0)
      .withColumn("wr_key",
        round(-log(u) / col(weightCol).cast("double"), 6))
      .orderBy(col("wr_key"), col(keyCol))
      .limit(k)
    ranked.withColumn("wr_rn",
      row_number().over(Window.orderBy(col("wr_key"), col(keyCol))))
  }

  /** Keep the k rows of `df` with the smallest salted hash of
    * `keyCol` (ties — impossible under distinct keys, broken by the
    * key for total determinism anyway). Adds `smp_rank` (the hash) and
    * `smp_rn` (1..k dense position). Compiles to a distributed
    * top-k (`TakeOrderedAndProject`), never a full sort.
    */
  def bottomK(df: DataFrame, keyCol: String, k: Int,
      salt: String = "smp"): DataFrame = {
    require(k > 0, s"sample size must be positive, got k=$k")
    import org.apache.spark.sql.expressions.Window
    val ranked = df.withColumn("smp_rank", rank(col(keyCol), salt))
      .orderBy(col("smp_rank"), col(keyCol))
      .limit(k)
    // The window runs over <= k rows (post-limit) — driver-scale work,
    // not a corpus sort.
    ranked.withColumn("smp_rn",
      row_number().over(Window.orderBy(col("smp_rank"), col(keyCol))))
  }
}
