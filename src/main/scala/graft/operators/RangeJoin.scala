package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (band) join — pairs of rows whose timestamps fall
  * within a window of each other, without the O(n²) theta join a naive
  * `a.ts < b.ts AND b.ts <= a.ts + w` produces.
  *
  * Scheme (the classic band-join decomposition): bucket every row into
  * `ts div w`; replicate the RIGHT side into its own and its previous
  * bucket; equi-join on (key, bucket); filter the exact band predicate.
  * Each qualifying pair meets in exactly one bucket (no dedup needed:
  * the two replica buckets are distinct), the join is a plain hash join
  * on (key, bucket), and the replication factor is a constant 2 — at
  * 100 TB this shuffles each side once and scales with matches, not
  * with the square of the partition size. Holds for negative epochs
  * too: both sides bucket with the same truncating `div`.
  */
object RangeJoin {

  /** Ordered pairs (a before b, strictly) within `windowUs` microseconds,
    * equi on `key`. Inputs need (`key`, `tsCol`) plus payload columns;
    * output columns are left's prefixed `a_`, right's prefixed `b_`,
    * plus `dt_us`.
    */
  def withinInterval(df: DataFrame, key: String, tsCol: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    // Single-projection renames (a foldLeft of withColumnRenamed can
    // collide with pre-existing prefixed names); backticks keep
    // non-trivial column names parseable in the div expressions.
    val a = df.select(df.columns.map(c => col(c).as(s"a_$c")): _*)
      .withColumn("a_bucket", expr(s"`a_$tsCol` div $windowUs"))
    val b = df.select(df.columns.map(c => col(c).as(s"b_$c")): _*)
      .withColumn("b_bucket",
        explode(array(expr(s"`b_$tsCol` div $windowUs"), expr(s"`b_$tsCol` div $windowUs - 1"))))
    // Equi-keys (key, bucket) are explicit in the join condition — not
    // left for the optimizer to recover from a post-join filter.
    a.join(b,
        col(s"a_$key") === col(s"b_$key") && col("a_bucket") === col("b_bucket")
          && col(s"b_$tsCol") > col(s"a_$tsCol")
          && col(s"b_$tsCol") <= col(s"a_$tsCol") + windowUs)
      .withColumn("dt_us", col(s"b_$tsCol") - col(s"a_$tsCol"))
      .drop("a_bucket", "b_bucket")
  }
}
