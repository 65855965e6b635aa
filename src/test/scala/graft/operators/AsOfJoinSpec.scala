package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: most recent prior right row per key, inclusive ties, nulls before any right row") {
    val left = Seq(
      (1L, 100L, "l-a"), // before any right row → null
      (1L, 200L, "l-b"), // matches right@200 (inclusive tie)
      (1L, 350L, "l-c"), // matches right@300
      (2L, 500L, "l-d")) // key 2 has no right rows → null
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 200L, 20.0),
      (1L, 300L, 30.0),
      (3L, 100L, 99.0)) // key 3 never joins
      .toDF("k", "rts", "rv")

    val out = AsOfJoin.asOf(left, right, key = "k", leftTs = "ts", rightTs = "rts",
      payload = Seq("rts", "rv"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("asof_rts")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("asof_rv")).map(_.toDouble)))

    assert(out.toSeq == Seq(
      ("l-a", None, None),
      ("l-b", Some(200L), Some(20.0)),
      ("l-c", Some(300L), Some(30.0)),
      ("l-d", None, None)))
  }

  test("asOf tolerance: inclusive boundary keeps the match; one past nulls it whole") {
    val left = Seq(
      (1L, 250L, "exact-50"),  // gap 50 == tolerance → kept
      (1L, 251L, "past-51"),   // gap 51 > tolerance → nulled
      (1L, 200L, "gap-0"))     // simultaneous → kept
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 200L, 20.0)).toDF("k", "rts", "rv")
    val out = AsOfJoin.asOf(left, right, key = "k", leftTs = "ts", rightTs = "rts",
      payload = Seq("rts", "rv"), tolerance = Some(50L))
      .collect()
      .map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Long]("asof_rts")),
          Option(r.getAs[java.lang.Double]("asof_rv"))))
      .toMap
    assert(out("exact-50") == (Some(200L), Some(20.0)))
    assert(out("past-51") == (None, None), "a stale match must null EVERY payload column")
    assert(out("gap-0") == (Some(200L), Some(20.0)))
  }
}
