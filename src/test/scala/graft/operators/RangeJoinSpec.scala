package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("withinInterval: bucket boundaries, strict lower bound, inclusive upper, no dup pairs") {
    // window = 100; rows chosen to straddle bucket edges
    val df = Seq(
      (1L, 0L, "a"), (1L, 99L, "b"),   // same bucket, dt 99
      (1L, 100L, "c"),                  // adjacent bucket: (0,100) dt=100 inclusive; (99,100) dt=1
      (1L, 201L, "d"),                  // (100,201) dt=101 > 100 → excluded; (99,201) dt=102 → excluded
      (2L, 0L, "x"), (2L, 50L, "y"),    // other key
      (1L, 0L, "a2"))                   // dt=0 with "a": strict > excludes
      .toDF("k", "ts", "tag")
    val pairs = RangeJoin.withinInterval(df, "k", "ts", windowUs = 100L)
      .select($"a_tag", $"b_tag", $"dt_us").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(
      ("a", "b", 99L), ("a2", "b", 99L),
      ("a", "c", 100L), ("a2", "c", 100L),
      ("b", "c", 1L),
      ("x", "y", 50L)), s"got $pairs")
  }

  test("withinInterval: negative epochs (trunc-div double-width bucket 0) still pair correctly") {
    // With truncating div, ts in (-w, w) all land in bucket 0 — the
    // replication scheme must neither drop nor duplicate pairs there.
    val df = Seq(
      (1L, -150L, "n1"), (1L, -60L, "n2"), (1L, -10L, "n3"), (1L, 30L, "p1"))
      .toDF("k", "ts", "tag")
    val pairs = RangeJoin.withinInterval(df, "k", "ts", windowUs = 100L)
      .select($"a_tag", $"b_tag", $"dt_us").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(
      ("n1", "n2", 90L), ("n2", "n3", 50L), ("n2", "p1", 90L),
      ("n3", "p1", 40L)), s"got $pairs")
  }

  test("withinInterval: non-positive window rejected") {
    val df = Seq((1L, 0L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.withinInterval(df, "k", "ts", windowUs = 0L)
    }
  }
}
