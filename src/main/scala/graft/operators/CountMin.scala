package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a DECLARATIVE
  * bounded aggregate — the overcount-side complement to
  * [[HeavyHitters]]' Misra-Gries:
  *
  *   - Misra-Gries answers "which items are frequent" with a
  *     deterministic UNDERCOUNT bound and a candidate set ≤ m; it
  *     cannot estimate the count of an arbitrary item that fell out.
  *   - Count-Min answers a POINT QUERY for ANY item: est(x) ≥ true(x)
  *     always (every hash row counts every occurrence — only
  *     collisions inflate), and est(x) ≤ true(x) + εN with probability
  *     ≥ 1 − δ at width w = ⌈e/ε⌉, depth d = ⌈ln 1/δ⌉.
  *
  * The Spark form is a d·w-row TABLE, not a custom buffer: each token
  * explodes into its d (hash-row, bucket) cells and a plain
  * `groupBy(hrow, bucket).count()` builds the sketch — map-side partial
  * aggregation bounds the exchange at ≤ d·w rows PER TASK regardless of
  * stream length or vocabulary (the same property the imperative
  * array-of-counters form has, expressed as a relational aggregate that
  * Catalyst codegens). Merging sketches is elementwise addition, which
  * the aggregate does inherently — the partial/final split IS the
  * mergeable-summaries law, and a cross-batch streamed form is the same
  * table summed over batches.
  *
  * Hashing is [[TextFunctions.hexHash60]] over `"i:item"` (row index
  * salt), so the DuckDB oracle replays the exact buckets and the
  * estimates match bit-for-bit — the sketch's content, not just its
  * bounds, is oracle-certified.
  *
  * 100 TB stance: the sketch never grows past d·w cells; point lookups
  * broadcast the sketch (d·w rows — a few KB) to the query side. The
  * audit query that REPORTS overcounts pays one extra exact wordcount
  * for truth, the same pay-for-truth contract as q_dd11/q_sim11.
  */
object CountMin {

  /** Bucket of `item` in hash row `i`: first-60-md5-bits of "i:item"
    * mod `w`. Non-negative, so `%` agrees across engines.
    */
  def bucket(item: Column, i: Int, w: Int): Column =
    TextFunctions.hexHash60(concat_ws(":", lit(i.toString), item)) % w

  /** Build the sketch over a token stream (`items` must expose a string
    * column `item`): one pass, output exactly the non-empty cells of
    * the d×w counter table as (hrow, bucket, c).
    *
    * Deliberately NOT the q_rel10h hash-after-distinct form (round-20
    * optimization note): hashing after a wordcount would cut the md5
    * count to d·|vocabulary|, but it would also replace this shape's
    * BOUNDED exchange (partial aggregation collapses to ≤ d·w rows per
    * task before the shuffle, for ANY key cardinality — the property
    * q_adv14's salt pricing and the 100 TB posture rest on) with a
    * vocabulary-sized keyed shuffle. A local-mode win only; rejected.
    */
  def sketch(items: DataFrame, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"sketch dims must be positive, got d=$d w=$w")
    items.select(posexplode(array(
        (0 until d).map(i => bucket(col("item"), i, w)): _*))
        .as(Seq("hrow", "bucket")))
      .groupBy("hrow", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Join-size estimate from two sketches (Cormode & Muthukrishnan
    * 2005 §4.2, the CM inner-product estimator): est = min over hash
    * rows of Σ_bucket cA·cB. Deterministically ≥ |A ⋈ B| = Σ_x
    * fA(x)·fB(x) (collisions only ADD cross terms), ≤ true + ε·N_A·N_B
    * with probability ≥ 1 − δ. The 100 TB use: price a join's output
    * BEFORE paying its shuffle, from two d·w-cell summaries that never
    * looked at each other's data — the sketch-composition property
    * (sketches of two streams combine into a statistic of their join).
    * Input sketches must share (d, w); the row join is ≤ d·w × d·w.
    */
  def joinSizeEstimate(ska: DataFrame, skb: DataFrame): DataFrame =
    ska.join(skb.withColumnRenamed("c", "cb"), Seq("hrow", "bucket"))
      .groupBy("hrow").agg(sum(col("c") * col("cb")).as("ip"))
      .agg(min("ip").as("est_pairs"))

  /** Store-cached EXACT join size (round 20): the 1-row
    * `true_pairs` = Σ_x fA(x)·fB(x) table the pricing audits
    * (q_txt22/q_txt23) compare the sketch estimate against — the
    * pay-for-truth side ([[Similarity.cachedTruth]]'s artifact class:
    * deterministic per (session, side plans), built once per JVM; the
    * sketch estimate stays re-executed per run). q_txt22 and
    * q_txt23's occurrences leg share one artifact (identical side
    * plans).
    */
  def cachedJoinSizeTruth(a: DataFrame, b: DataFrame,
      keyCol: String = "item"): DataFrame =
    Similarity.storeCachedKeyed("cmstruth",
      Seq(a.sparkSession,
        a.queryExecution.analyzed.canonicalized,
        b.queryExecution.analyzed.canonicalized, keyCol),
      a.groupBy(keyCol).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(keyCol).agg(count(lit(1)).as("cb")), keyCol)
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("true_pairs")))

  /** Point-query estimates for `queries` (string column `item`,
    * distinct): est = min over the d rows of the item's cell, absent
    * cells read 0 (an item never sketched estimates 0 only if some row
    * has an empty cell — otherwise collisions inflate, never deflate).
    * The sketch side is broadcast: it is ≤ d·w rows by construction.
    */
  def estimates(queries: DataFrame, sk: DataFrame, d: Int, w: Int): DataFrame = {
    val cells = queries.select(col("item"), posexplode(array(
        (0 until d).map(i => bucket(col("item"), i, w)): _*))
        .as(Seq("hrow", "bucket")))
    cells.join(broadcast(sk), Seq("hrow", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }
}
