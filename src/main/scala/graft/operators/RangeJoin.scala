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
  * Each qualifying pair meets in exactly one bucket (no dedup needed),
  * the join is a plain hash join on (key, bucket), and the replication
  * factor is a constant 2 — at 100 TB this shuffles each side once and
  * scales with matches, not with the square of the partition size.
  */
object RangeJoin {

  /** Ordered pairs (a before b, strictly) within `windowUs` microseconds,
    * equi on `key`. Inputs need (`key`, `tsCol`) plus payload columns;
    * output columns are left's prefixed `a_`, right's prefixed `b_`,
    * plus `dt_us`.
    */
  def withinInterval(df: DataFrame, key: String, tsCol: String,
      windowUs: Long): DataFrame = {
    val a = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumn("bucket", expr(s"a_$tsCol div $windowUs"))
    val b0 = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val b = b0.withColumn("bucket",
      explode(array(expr(s"b_$tsCol div $windowUs"), expr(s"b_$tsCol div $windowUs - 1"))))
    // Equi keys: bucket via USING; the key equality below is pushed into
    // the join condition by Catalyst, so the hash join keys are
    // (bucket, key).
    a.join(b, Seq("bucket"))
      .where(col(s"a_$key") === col(s"b_$key")
        && col(s"b_$tsCol") > col(s"a_$tsCol")
        && col(s"b_$tsCol") <= col(s"a_$tsCol") + windowUs)
      .withColumn("dt_us", col(s"b_$tsCol") - col(s"a_$tsCol"))
      .drop("bucket")
  }
}
