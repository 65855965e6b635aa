package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profile semantics on a planted frame: null/distinct accounting per
  * column, the type-safe min/max serialization (integer micro for
  * numerics incl. the negative-HALF_UP edge, epoch-µs for timestamps,
  * raw for strings), the approx variant's shape identity + HLL
  * envelope, and the argument guards.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def planted = Seq(
    (1L, Some(2.5), Some("a")),
    (1L, Some(-2.0000005), Some("b")),
    (2L, None, Some("a")),
    (3L, Some(7.25), None),
    (3L, Some(7.25), Some("c")))
    .toDF("k", "x", "s")

  test("counts, nulls, distincts and per-type min/max serialization") {
    val p = Profile.profile(planted, Seq("k", "x", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(p("k") == (5L, 0L, 3L, "1000000", "3000000"))
    // min(x) = -2.0000005 → micro −2000000.5 rounds HALF_UP away from
    // zero to −2000001 (the Spark round law, not math.round's).
    assert(p("x") == (5L, 1L, 3L, "-2000001", "7250000"))
    assert(p("s") == (5L, 1L, 3L, "a", "c"))
  }

  test("timestamp columns serialize as epoch-µs strings") {
    val df = Seq("2001-11-04 00:00:00", "1995-01-01 00:00:01")
      .toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"))
    val p = Profile.profile(df, Seq("ts")).collect().head
    assert(p.getString(4) == "788918401000000")
    assert(p.getString(5) == "1004832000000000")
  }

  test("approxProfile: identical shape, exact columns equal, HLL estimate within the engine envelope") {
    val df = spark.range(0L, 5000L)
      .select((col("id") % 977).as("k"), (col("id") % 10).as("d"))
    val exact = Profile.profile(df, Seq("k", "d")).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.approxProfile(df, Seq("k", "d"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("k", "d")) {
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      assert(a.getString(4) == e.getString(4) &&
        a.getString(5) == e.getString(5))
      val (nd, est) = (e.getLong(3), a.getLong(3))
      assert(math.abs(est - nd) <= math.max(1L, (5 * 0.05 * nd).toLong),
        s"col $c: estimate $est vs exact $nd")
    }
  }

  test("guards: unknown column and empty column list refuse") {
    intercept[IllegalArgumentException] {
      Profile.profile(planted, Seq("k", "nope"))
    }
    intercept[IllegalArgumentException] {
      Profile.profile(planted, Seq.empty)
    }
  }
}
