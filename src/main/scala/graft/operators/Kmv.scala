package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** KMV (k-minimum-values) distinct-value synopses — Beyer, Haas,
  * Reinwald, Sismanis & Gemulla, SIGMOD 2007 ("On synopses for
  * distinct-value estimation under multiset operations"), the
  * bottom-k face of cardinality estimation and the SET-ALGEBRA
  * member of the sketch family: where HLL ([[q_rel10b]]'s carve-out)
  * answers |A| and can only reach |A∩B| through inclusion–exclusion
  * with COMPOUNDED error, a KMV synopsis supports union, intersection
  * and Jaccard natively, because coordinated bottom-k signatures are
  * a uniform sample of the DISTINCT-value space:
  *
  *  - signature(S) = the k smallest distinct salted hashes of S;
  *  - sig(A ∪ B)  = bottomK(sig(A) ∪ sig(B)) — mergeable exactly like
  *    [[Sampling.bottomK]] (same law, over distinct hashes);
  *  - |A ∪ B|     ≈ (k−1)·2⁶⁰ / h₍k₎ (the unbiased basic estimator,
  *    Beyer et al. §3; EXACT when the union carries < k distinct
  *    hashes — the synopsis IS the distinct set then);
  *  - Jaccard     ≈ |L ∩ sig(A) ∩ sig(B)| / |L| for L = sig(A∪B)
  *    (ρ in Beyer et al. §5.2), and |A ∩ B| ≈ ρ · |A ∪ B| — with
  *    relative error O(1/√k) of the UNION size, not of a difference
  *    of three independently-erring estimates.
  *
  * The determinism discipline is the point of this implementation:
  * the rank hash is the md5-parity [[TextFunctions.hexHash60]] under
  * a caller salt — [[Sampling]]'s coordinated-sampling hash — so the
  * whole estimator (signatures, h₍k₎, overlap count, the final
  * divisions in IEEE double) is REPLAYED EXACTLY by the DuckDB
  * oracle: unlike HLL, the KMV point estimate itself is a
  * hash-certified green value (q_rel10h), not a rows-only carve-out.
  *
  * Scale shape: a signature build is one distinct partial+final
  * aggregate (map-side combine bounds per-partition duplicates)
  * feeding a distributed top-k (`TakeOrderedAndProject` — the
  * exchange carries k·partitions hashes, never the corpus); all
  * later algebra runs on ≤ k-row tables (broadcast joins only).
  */
object Kmv {

  /** 2⁶⁰ as an IEEE double — [[TextFunctions.hexHash60]]'s range. */
  val Scale: Double = 1152921504606846976.0e0

  /** The salted 60-bit rank of `key` (same family as
    * [[Sampling.rank]]; equal salts coordinate signatures so their
    * set algebra composes).
    */
  def hash(key: Column, salt: String): Column =
    TextFunctions.hexHash60(concat_ws(":", lit(salt), key))

  /** The KMV synopsis of `keyCol`'s distinct values: the k smallest
    * DISTINCT salted hashes, as a ≤ k-row table `(kmv_h)`. Hash
    * collisions merge values — the standard KMV treatment (the
    * estimator is defined over the hash space; at 60 bits the
    * collision mass is negligible and, being deterministic, both
    * engines agree on it).
    */
  def signature(df: DataFrame, keyCol: String, k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k > 2, s"kmv needs k > 2 (k-1 and k-2 appear in estimators), got $k")
    df.select(hash(col(keyCol), salt).as("kmv_h"))
      .distinct()
      .orderBy("kmv_h")
      .limit(k)
  }

  /** The distinct-count estimate off a signature, as a 1-row
    * `(n_sig, est)` table: exact `n_sig` when the synopsis absorbed
    * the whole hash set (n_sig < k), the unbiased (k−1)·2⁶⁰/h₍k₎
    * basic estimator otherwise. `est` is a raw IEEE double — callers
    * round at the emit boundary only.
    */
  def distinctEstimate(sig: DataFrame, k: Int): DataFrame =
    sig.agg(count(lit(1)).as("n_sig"), max(col("kmv_h")).as("h_k"))
      .select(col("n_sig"),
        when(col("n_sig") < k, col("n_sig").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Scale) /
            col("h_k").cast("double"))
          .as("est"))

  /** Set algebra over two SAME-(k, salt) signatures: one row
    * `(n_l, in_both, est_union, jaccard, est_inter)` where `n_l` is
    * the union synopsis size, `in_both` the overlap count inside it,
    * and the estimates are Beyer et al.'s ρ-composition. Runs
    * entirely on ≤ k-row inputs — both membership joins broadcast.
    */
  def setAlgebra(sigA: DataFrame, sigB: DataFrame, k: Int): DataFrame = {
    val l = sigA.union(sigB).distinct().orderBy("kmv_h").limit(k)
    val flagged = l
      .join(broadcast(sigA.withColumn("in_a", lit(1))), Seq("kmv_h"), "left")
      .join(broadcast(sigB.withColumn("in_b", lit(1))), Seq("kmv_h"), "left")
    flagged.agg(
        count(lit(1)).as("n_l"),
        max(col("kmv_h")).as("h_k"),
        coalesce(sum((col("in_a").isNotNull && col("in_b").isNotNull)
          .cast("long")), lit(0L)).as("in_both"))
      .select(
        col("n_l"), col("in_both"),
        when(col("n_l") < k, col("n_l").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Scale) /
            col("h_k").cast("double"))
          .as("est_union"))
      .withColumn("jaccard",
        when(col("n_l") > 0,
          col("in_both").cast("double") / col("n_l").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("est_inter", col("jaccard") * col("est_union"))
  }
}
