package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series join Spark's public
  * API lacks (SURVEY.md §4.3 candidate; DuckDB ships it natively as
  * `ASOF JOIN`, which is the oracle).
  *
  * Built by composition (preference (a) over a custom SparkPlan): tag and
  * union both sides, sort per key by (time, side), and carry the last
  * non-null right-side payload forward with an `ignoreNulls` last()
  * window. Cost: ONE shuffle on the key + a per-partition sort — same
  * asymptotics as a sort-merge join, no per-row probe, no range
  * explosion; at 100 TB both sides co-partition on the key and the sort
  * is local.
  *
  * Semantics: for each left row, the right row with the greatest
  * `rightTs` ≤ `leftTs` for the same key (inclusive, left-outer: no
  * prior right row → nulls). The right side must be unique per
  * (key, ts) — pre-dedup it (latest-wins) or the match among ties is
  * undefined in BOTH engines.
  */
object AsOfJoin {

  /** @param left      left rows; must contain `key`, `leftTs`
    * @param right     right rows; must contain `key`, `rightTs`, `payload`
    * @param key       equi-join key column name (both sides)
    * @param leftTs    left event-time column name (long/µs or any ordered type)
    * @param rightTs   right event-time column name
    * @param payload   right columns to carry (renamed as-is onto the output)
    * @param tolerance max `leftTs - rightTs` (same units as the ts
    *                  columns, which must then be numeric) — a prior
    *                  right row older than this does NOT match (the
    *                  pandas `merge_asof(tolerance=...)` semantic);
    *                  None = unbounded lookback
    * @return left rows + matched payload columns (null when no prior right row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val reserved = Seq("__ts", "__side", "__p", "__asof", "__rts")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns must not use the reserved names ${reserved.mkString(", ")}")
    val leftCols = left.columns
    // side = 0 sorts right rows BEFORE left rows at equal timestamps →
    // an exactly-simultaneous right row is visible to the left row
    // (inclusive <= semantics, matching DuckDB ASOF).
    // Payload travels as ONE struct so every carried column comes from
    // the SAME right row even if individual payload values are null; the
    // right timestamp rides along as __rts only when a tolerance needs
    // it (it would be dead shuffle weight on the unbounded path).
    val payloadFields = payload.map(col) ++
      (if (tolerance.isDefined) Seq(col(rightTs).as("__rts")) else Nil)
    val taggedRight = right.select(
      col(key).as(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payloadFields: _*).as("__p"))
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        leftCols.filterNot(_ == key).map(col)): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = tolerance match {
      // Stale match → null struct → every payload column null, exactly
      // like no-match (when() without otherwise yields NULL).
      case Some(tol) => matched.withColumn("__asof",
        when(col("__ts") - col("__asof.__rts") <= tol, col("__asof")))
      case None => matched
    }
    bounded.select(
      (leftCols.map(col) ++ payload.map(c => col(s"__asof.$c").as(s"asof_$c"))): _*)
  }
}
