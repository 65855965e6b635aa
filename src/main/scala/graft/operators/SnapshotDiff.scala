package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General snapshot diff — the CDC delta between two keyed snapshots
  * of the same relation: which keys were inserted, deleted, or
  * updated, with before- and after-images. This is the two-arbitrary-
  * tables form (deletes are real here); when both snapshots derive
  * from one append-only log the diff fuses into a single aggregate
  * instead — see `RelationalQueries.snapshotDiff` (q_rel33) — and
  * when the "new" side is a live stream the delta is emitted
  * incrementally by [[graft.streaming.CowUpsertStream]]'s changelog,
  * whose spec certifies each emitted generation against THIS operator
  * (changelog(g) ≡ diff(state(g−1), state(g))).
  *
  * Contract: each input holds ONE row per key (a snapshot, not a log)
  * and key columns are non-null — null join keys never match, so a
  * null-keyed row would surface as a spurious insert+delete pair
  * rather than an update; callers dedup/filter first (the upsert
  * stores guarantee both by construction).
  *
  * Shape at scale: one full-outer hash join on the key — each side
  * shuffles once on the key it is already naturally keyed by (a
  * snapshot store partitioned on its key co-locates for free), and
  * AQE broadcasts a small side (the common "yesterday vs today"
  * case where one side is a fresh delta). Unchanged keys — the
  * overwhelming majority between adjacent snapshots — are dropped by
  * a null-safe struct compare BEFORE the output materializes, so the
  * result is sized by the CHANGE volume, never the snapshot.
  */
object SnapshotDiff {

  /** Change rows between `oldDf` and `newDf` (same schema, one row
    * per `keys`): key columns, `op` ('insert' | 'delete' | 'update'),
    * then `old_<c>` / `new_<c>` for every non-key column (null on
    * the absent side of an insert/delete). Keys present in both with
    * identical non-key values (null-safe, field-wise) are dropped.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSeq == cols,
      s"snapshot schemas differ: old=${cols.mkString(",")} " +
        s"new=${newDf.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"keys ${keys.mkString(",")} must be columns of the snapshots")
    val vals = cols.filterNot(keys.contains)
    require(vals.nonEmpty, "snapshots need at least one non-key column")
    def pack(df: DataFrame, as: String): DataFrame =
      df.select((keys.map(col) :+ struct(vals.map(col): _*).as(as)): _*)
    val joined = pack(oldDf, "_old")
      .join(pack(newDf, "_new"), keys, "full_outer")
    val outCols: Seq[Column] =
      keys.map(col) :+
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .otherwise(lit("update")).as("op")
    val imgs: Seq[Column] =
      vals.map(v => col(s"_old.$v").as(s"old_$v")) ++
        vals.map(v => col(s"_new.$v").as(s"new_$v"))
    joined
      .where(col("_old").isNull || col("_new").isNull ||
        !(col("_old") <=> col("_new")))
      .select(outCols ++ imgs: _*)
  }
}
