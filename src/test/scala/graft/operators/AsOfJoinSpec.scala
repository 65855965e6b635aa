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

  test("property: asOf ≡ brute-force most-recent-prior on random tables, ± tolerance") {
    // Deterministic pseudo-random tables with deliberate key overlap and
    // timestamp collisions across sides (right side unique per (k, ts),
    // as the operator contract requires).
    val rnd = new scala.util.Random(7)
    val leftRows = (0 until 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong * 10, i.toLong))
    val rightRows = rnd.shuffle(
      (for (k <- 0L until 10L; slot <- 0 until 25) yield (k, slot.toLong * 20))
        .toSeq).take(120).zipWithIndex
      .map { case ((k, ts), i) => (k, ts, i * 1.5) }

    def reference(tol: Option[Long]): Map[Long, Option[(Long, Double)]] = {
      val byKey = rightRows.groupBy(_._1)
      leftRows.map { case (k, ts, id) =>
        val prior = byKey.getOrElse(k, Seq.empty).filter(_._2 <= ts)
        val best = if (prior.isEmpty) None else {
          val m = prior.maxBy(_._2)
          if (tol.exists(t => ts - m._2 > t)) None else Some((m._2, m._3))
        }
        id -> best
      }.toMap
    }

    for (tol <- Seq(None, Some(60L), Some(0L))) {
      val left = leftRows.toDF("k", "ts", "lid")
      val right = rightRows.toDF("k", "rts", "rv")
      val got = AsOfJoin.asOf(left, right, key = "k", leftTs = "ts", rightTs = "rts",
        payload = Seq("rts", "rv"), tolerance = tol)
        .collect()
        .map(r => r.getAs[Long]("lid") ->
          (Option(r.getAs[java.lang.Long]("asof_rts")) match {
            case Some(t) => Some((t.toLong, r.getAs[java.lang.Double]("asof_rv").toDouble))
            case None => None
          }))
        .toMap
      assert(got == reference(tol), s"divergence from brute force at tolerance=$tol")
    }
  }
}
