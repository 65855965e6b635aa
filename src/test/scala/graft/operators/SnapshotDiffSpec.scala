package graft.operators

import graft.SparkSpec

/** The general two-snapshot CDC diff: all four key fates (insert,
  * delete, update, unchanged-dropped), null-safe value compare, and
  * the contract guards.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("insert, delete, update and unchanged each land in their class") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "tag", "v")
    val d = SnapshotDiff.diff(old, neu, Seq("k"))
    assert(d.columns.toSeq ==
      Seq("k", "op", "old_tag", "old_v", "new_tag", "new_v"))
    assert(rows(d) == Set(
      Seq(1L, "delete", "a", 10.0, null, null),
      Seq(3L, "update", "c", 30.0, "c", 31.0),
      Seq(4L, "insert", null, null, "d", 40.0)))
    // key 2 is unchanged — dropped before the output materializes
  }

  test("null-safe compare: null==null is unchanged, null vs value is an update") {
    val old = Seq[(Long, java.lang.Double)]((1L, null), (2L, 5.0))
      .toDF("k", "v")
    val neu = Seq[(Long, java.lang.Double)]((1L, null), (2L, null))
      .toDF("k", "v")
    val d = SnapshotDiff.diff(old, neu, Seq("k"))
    assert(rows(d) == Set(Seq(2L, "update", 5.0, null)))
  }

  test("composite keys diff on the full key") {
    val old = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "sub", "v")
    val neu = Seq((1L, "x", 1.0), (1L, "z", 3.0)).toDF("k", "sub", "v")
    val d = SnapshotDiff.diff(old, neu, Seq("k", "sub"))
    assert(rows(d) == Set(
      Seq(1L, "y", "delete", 2.0, null),
      Seq(1L, "z", "insert", null, 3.0)))
  }

  test("contract guards: schema mismatch, unknown key, key-only schema all refuse") {
    val a = Seq((1L, 1.0)).toDF("k", "v")
    val b = Seq((1L, 1.0)).toDF("k", "w")
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, b, Seq("k")) }
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, a, Seq("nope")) }
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, a, Seq.empty) }
    val keysOnly = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(keysOnly, keysOnly, Seq("k"))
    }
  }
}
