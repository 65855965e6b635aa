package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-priced skew salting — the composition of two measured laws:
  *
  *  - SkewProbe (SCALE.md): AQE's skew-join only splits a partition
  *    ≥ skewedPartitionFactor × the median — a key holding ~10% of a
  *    relation inflates its reducer ~4× the fair share yet still
  *    clears under the default 5× median floor UNMARKED (the probe's
  *    measured negative space), and partial-aggregation-free plans
  *    (joins, collect-heavy aggs) eat the whole imbalance;
  *  - q_txt23 (CountMin): per-key frequencies are priced from a d·w
  *    bounded sketch BEFORE any shuffle is paid — the CMS only ever
  *    OVERcounts, so a key flagged hot by the estimate is at worst a
  *    needlessly-salted key (extra replicas), never a missed one at
  *    the same threshold.
  *
  * [[decideSalt]] is the priced trigger: flag exactly the keys whose
  * estimated count exceeds (factor × fair share) — the band AQE leaves
  * unhandled — and [[saltedEquiJoin]] is the q_adv3 two-phase rewrite
  * applied PARTIALLY: only flagged keys' probe rows scatter over
  * `salts` sub-keys (and only their build rows replicate ×salts);
  * unflagged keys join on salt 0 exactly as before. At 100 TB the
  * sketch is the streamed [[graft.streaming.CountMinStream]] artifact,
  * so the decision costs a broadcast of ≤ d·w cells against the
  * candidate list — the corpus is never touched before the one join
  * that was going to run anyway. Decision rule certified end-to-end by
  * the q_adv14 oracle (integer arithmetic both engines); the salted
  * plan's win on the AQE-unmarked 10% case is SkewProbe's salted row.
  */
object SkewSalt {

  /** Per-candidate salting decision off a [[CountMin]] sketch:
    * (item, est_n, n_rows, salt) with
    * salt ⇔ est_n · parts · factorDen > n_rows · factorNum — i.e. the
    * key's estimated share exceeds (factorNum/factorDen) × the fair
    * per-reducer share 1/parts. All-integer arithmetic so the rule
    * replays exactly in the oracle engine. `nRows` is a 1-row
    * relation carrying the stream's total as `n_rows` (Σc of any
    * sketch row — derivable from the sketch itself, no corpus pass).
    */
  def decideSalt(candidates: DataFrame, sk: DataFrame, d: Int, w: Int,
      nRows: DataFrame, parts: Int,
      factorNum: Long = 2L, factorDen: Long = 1L): DataFrame = {
    require(parts > 0, s"parts must be positive, got $parts")
    require(factorNum > 0 && factorDen > 0,
      s"factor must be positive, got $factorNum/$factorDen")
    CountMin.estimates(candidates, sk, d, w)
      .crossJoin(broadcast(nRows.select(col("n_rows"))))
      .withColumn("salt",
        col("est_n") * lit(parts.toLong) * lit(factorDen) >
          col("n_rows") * lit(factorNum))
  }

  /** The stream total OFF the sketch — every hash row holds Σ of all
    * counts, so min-over-rows of the row sums is exact (1 row out,
    * ≤ d·w in; the corpus is not consulted).
    */
  def sketchTotal(sk: DataFrame): DataFrame =
    sk.groupBy("hrow").agg(sum("c").as("rs"))
      .agg(min("rs").as("n_rows"))

  /** Partially-salted inner equi-join on `key`: rows of `hot` keys
    * scatter over `salts` sub-keys on the probe side (spread by
    * `saltOn`, a deterministic per-row column — an id, never rand())
    * and replicate ×`salts` on the build side; all other keys ride
    * salt 0 untouched. Exact inner-join semantics — each probe row
    * meets each matching build row exactly once (on the probe row's
    * own salt replica). Cost: build-side inflation is
    * |hot build rows| · salts, NOT |build| · salts — the reason to
    * salt only priced keys instead of q_adv3's uniform salt.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      hot: DataFrame, salts: Int, saltOn: Column): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val hotFlag = broadcast(
      hot.select(col(key)).distinct().withColumn("__hot", lit(true)))
    val f = fact.join(hotFlag, Seq(key), "left")
      .withColumn("__salt",
        when(coalesce(col("__hot"), lit(false)),
          pmod(xxhash64(saltOn), lit(salts.toLong))).otherwise(lit(0L)))
      .drop("__hot")
    val d = dim.join(hotFlag, Seq(key), "left")
      .withColumn("__salt", explode(
        when(coalesce(col("__hot"), lit(false)),
          array((0 until salts).map(s => lit(s.toLong)): _*))
          .otherwise(array(lit(0L)))))
      .drop("__hot")
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
