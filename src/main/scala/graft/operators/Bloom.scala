package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970) as a bounded bit-position TABLE — the
  * set-membership sketch completing the sketch family next to
  * [[CountMin]] (point counts, overcount-side) and
  * [[HeavyHitters]] (frequent items, undercount-side):
  *
  *   - membership(x) = true for every inserted x (no false negatives);
  *     false positives at rate ≈ (1 − e^(−kn/m))^k for n inserted
  *     items, m bits, k hash rows. One-sided error in the SAFE
  *     direction for a decontamination pre-filter: a gram the filter
  *     passes might be clean (verified exactly downstream), but a gram
  *     it rejects is NEVER in the benchmark.
  *
  * The Spark form is a ≤ m-row table of set bit positions, not a
  * packed bitmap: `build` explodes each item into its k salted-hash
  * positions and a map-side-combined `distinct` bounds the exchange at
  * ≤ m rows per task regardless of item count (the [[CountMin.sketch]]
  * property). Merging filters is set UNION of bit tables — the
  * partial/final split of the distinct IS the mergeable-summaries law.
  *
  * Membership probing ([[filterMembers]]) is k chained BROADCAST
  * left-semi joins, one per hash row — the conjunction "all k bits
  * set" with zero shuffle and no explode/regroup round-trip, so a
  * probe can run map-side BEFORE a corpus shuffle and cut what the
  * shuffle carries to the candidate subset. That ordering — hash the
  * occurrence, drop it early, shuffle only survivors — is the whole
  * 100 TB argument for a Bloom pre-filter in front of an exact
  * contamination join (q_ml7's shape): the exact join's cost scales
  * with candidates, not with the corpus.
  *
  * Hashing reuses [[CountMin.bucket]] (md5-parity hexHash60 over
  * "i:item"), so the DuckDB oracle replays the exact bit positions and
  * the filter's CONTENT — which grams pass, which don't, including
  * false positives — is oracle-certified, not just its error bound.
  */
object Bloom {

  /** Bit position of `item` in hash row `i`: same salted 60-bit md5
    * family as the Count-Min buckets (one hash family serves both
    * sketches), reduced mod the bit-array width `m`.
    */
  def bit(item: Column, i: Int, m: Int): Column = CountMin.bucket(item, i, m)

  /** Build the filter over `items` (string column `item`): the
    * distinct set-bit positions of all k hash rows, as a single-column
    * (`bit`) table of ≤ m rows. One pass; the distinct's partial
    * aggregation bounds the exchange at ≤ m rows per task.
    */
  def build(items: DataFrame, k: Int, m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    items.select(explode(array(
        (0 until k).map(i => bit(col("item"), i, m)): _*)).as("bit"))
      .distinct()
  }

  /** Keep exactly the rows of `df` whose `itemCol` the filter might
    * contain (all k bits set): k chained broadcast LeftSemi joins — the
    * bit-wise AND as relational algebra. Each join is map-side (the
    * filter is ≤ m rows by construction); rows never shuffle, so the
    * probe composes BEFORE downstream exchanges. Guaranteed superset
    * of the true members (no false negatives).
    */
  def filterMembers(df: DataFrame, itemCol: String, bloom: DataFrame,
      k: Int, m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    (0 until k).foldLeft(df) { (acc, i) =>
      acc.join(broadcast(bloom), bit(col(itemCol), i, m) === bloom("bit"),
        "left_semi")
    }
  }
}
