package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Knife-edge semantics from FIXTURES.md §1: hour-boundary window
  * assignment (AGG-1), histogram bucket edges at 999/1000/1001 (AGG-2),
  * duplicate-key dedup (DD-1).
  */
class EventSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("AGG-1 hour bucketing: a record exactly on the hour belongs to that hour") {
    val df = Seq(
      Timestamp.valueOf("2022-07-14 15:00:00"), // exactly on the hour
      Timestamp.valueOf("2022-07-14 15:59:59"),
      Timestamp.valueOf("2022-07-14 16:00:00"))
      .toDF("ts").select(date_format(col("ts"), "yyyy-MM-dd-HH").as("hour"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("2022-07-14-15", "2022-07-14-15", "2022-07-14-16"))
  }

  test("AGG-2 histogram edges: 999 → bucket 0, 1000/1001 → bucket 1000") {
    val df = Seq(999L, 1000L, 1001L).toDF("count")
      .select(expr("(count div 1000) * 1000").as("bucket"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1000L, 1000L))
  }

  test("DD-1: dedup is idempotent and keeps one row per key") {
    val df = Seq(("rpi", 1L, 10.0), ("rpi", 1L, 10.0), ("rpi", 2L, 11.0))
      .toDF("client_id", "count", "temperature")
    val once = df.dropDuplicates("client_id", "count")
    val twice = once.dropDuplicates("client_id", "count")
    assert(once.count() == 2)
    assert(twice.count() == 2)
  }

  test("REL-10b: approx_count_distinct within tolerance of the exact counts") {
    // q_rel10b is the one non-oracled query (HLL has no DuckDB
    // equivalent); this pins it quantitatively instead: at rsd=0.01 the
    // estimate must sit within 5·rsd of the exact distinct count on the
    // real tables at both correctness SFs.
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val li = graft.sources.Tables.lineitem(spark, dir)
      val row = li.agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a_ord"),
        countDistinct(col("l_orderkey")).as("e_ord"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a_part"),
        countDistinct(col("l_partkey")).as("e_part")).head()
      for ((a, e, what) <- Seq(
          (row.getLong(0), row.getLong(1), s"orders sf$sf"),
          (row.getLong(2), row.getLong(3), s"parts sf$sf"))) {
        val relErr = math.abs(a - e).toDouble / e
        info(f"$what%-14s approx=$a exact=$e relErr=$relErr%.4f")
        assert(relErr <= 0.05, f"$what: HLL rel. error $relErr%.4f beyond 5*rsd")
      }
    }
  }

  test("streaming wire roundtrip preserves values at second granularity") {
    import graft.streaming.SensorPipeline
    val now = Timestamp.valueOf("2022-07-14 15:00:01")
    val sensor = Seq(("raspberrypi", now, 43.88, 39.67, 1012.3, 0.4, 1.2, 270.0, 3001L))
      .toDF("client_id", "timestamp", "humidity", "temperature", "pressure",
        "pitch", "roll", "yaw", "count")
    val back = SensorPipeline.parseWire(SensorPipeline.toWire(sensor)).head()
    assert(back.getAs[String]("client_id") == "raspberrypi")
    assert(back.getAs[Timestamp]("timestamp") == now)
    assert(back.getAs[Double]("temperature") == 39.67)
    assert(back.getAs[Long]("count") == 3001L)
  }

  test("AGG-9 M4: planted series reduces to exact per-bucket anchors; ties break deterministically") {
    // 2 series x 100 points on a regular 1-us grid, W = 10 -> each
    // bucket holds exactly ts 10i..10i+9; values chosen so min/max/
    // first/last are all DIFFERENT rows within a bucket.
    val pts = for (s <- Seq("a", "b"); i <- 0 until 100) yield {
      val v = if (s == "a") ((i * 37) % 100).toDouble // scrambled
      else -i.toDouble // monotone decreasing
      (s, i.toLong, v)
    }
    val m4 = EventQueries.m4(pts.toDF("event_type", "ts_us", "value"), 10)
      .collect()
    assert(m4.length == 20) // 2 series x 10 buckets, none empty
    m4.foreach { r =>
      val (s, b) = (r.getAs[String]("event_type"), r.getAs[Long]("bucket"))
      val in = pts.filter(p => p._1 == s && p._2 / 10 == b).map(_._3)
      assert(r.getAs[Long]("n") == 10L)
      assert(r.getAs[Long]("t_first_us") == b * 10)
      assert(r.getAs[Long]("t_last_us") == b * 10 + 9)
      assert(r.getAs[Double]("v_min") == in.min)
      assert(r.getAs[Double]("v_max") == in.max)
      assert(r.getAs[Double]("v_first") == in.head)
      assert(r.getAs[Double]("v_last") == in.last)
    }
    // M4's rendering guarantee rests on the anchors bounding the
    // bucket: min <= first, last <= max always.
    m4.foreach { r =>
      assert(r.getAs[Double]("v_min") <= r.getAs[Double]("v_first"))
      assert(r.getAs[Double]("v_max") >= r.getAs[Double]("v_last"))
    }
    // Tie discipline: two rows at the SAME first us -> MIN value wins
    // first; two at the same last us -> MAX value wins last.
    val ties = Seq(("t", 0L, 5.0), ("t", 0L, 3.0), ("t", 9L, 7.0),
      ("t", 9L, 8.0)).toDF("event_type", "ts_us", "value")
    val tr = EventQueries.m4(ties, 1).collect()
    assert(tr.length == 1)
    assert(tr.head.getAs[Double]("v_first") == 3.0)
    assert(tr.head.getAs[Double]("v_last") == 8.0)
    assert(tr.head.getAs[Long]("n") == 4L)
  }

  test("AGG-10 EWMA: distributed smoother == driver-side exact recomputation, BIT-identical") {
    // The construction claims bit determinism (exponent-shift weights,
    // integer micro-unit means, pinned fold order) — so the check is
    // ==, not a tolerance: recompute every row's EWMA from the hourly
    // table in plain Scala with the same left fold and compare doubles
    // exactly.
    val dir = "/root/testdata/sf0.001"
    val out = EventQueries.ewmaSmooth(spark, dir).collect()
    val hourly = out.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("hour_us"), r.getAs[Long]("avg_micro")))
    val hourUs = 3600000000L
    out.foreach { r =>
      val (s, h) = (r.getAs[String]("event_type"), r.getAs[Long]("hour_us"))
      val win = hourly.filter(p => p._1 == s && p._2 <= h &&
        p._2 >= h - 47L * hourUs).sortBy(_._2)
      val num = win.foldLeft(0.0) { case (acc, (_, hj, v)) =>
        acc + v.toDouble / (1L << ((h - hj) / hourUs)).toDouble }
      val den = win.foldLeft(0.0) { case (acc, (_, hj, _)) =>
        acc + 1.0 / (1L << ((h - hj) / hourUs)).toDouble }
      assert(r.getAs[Double]("ewma_micro") == num / den,
        s"series $s hour $h must match bit-for-bit")
    }
    // Law anchors: an isolated first point's EWMA is its own mean; a
    // window of identical means smooths to that mean exactly.
    out.groupBy(r => r.getAs[String]("event_type")).foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[Long]("hour_us"))
      assert(first.getAs[Double]("ewma_micro") ==
        first.getAs[Long]("avg_micro").toDouble)
    }
  }

  test("ADV-9 cohorts: retention matrix == driver-side recomputation from raw events") {
    val dir = "/root/testdata/sf0.001"
    val weekUs = 604800000000L
    val raw = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr(s"(ts_ns div 1000) div $weekUs").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstWeek = raw.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min }
    val got = AdvancedQueries.cohortRetention(spark, dir).collect()
    // Every cohort's offset-0 row exists with full retention ( the
    // cohort week is, by construction, an active week for each user).
    got.filter(_.getAs[Long]("week_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") == 1.0)
    }
    got.foreach { r =>
      val (cw, off) = (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"))
      val expectActive = raw.filter { case (u, w) =>
        firstWeek(u) == cw && w == cw + off }.map(_._1).distinct.length
      assert(r.getAs[Long]("n_active") == expectActive.toLong,
        s"cohort $cw offset $off")
      assert(r.getAs[Long]("cohort_size") ==
        firstWeek.count(_._2 == cw).toLong)
    }
  }

  test("AGG-13 MAD robustness: the spike σ-inflation hides, MAD still flags") {
    // 100 baseline points spread over [-3, 3], one mega-spike (1000)
    // and one modest spike (15). The mega-spike inflates σ so far that
    // the modest spike's classical z drops below 3 (the q_agg6 filter
    // goes blind); the median and MAD barely move, so the robust z
    // flags BOTH. This is the claim q_agg13 exists for.
    val base = (0 until 100).map(i => (i % 7).toDouble - 3.0)
    val vals = base ++ Seq(1000.0, 15.0)
    val df = vals.toDF("v")
    val stats = df.agg(avg("v").as("mu"), stddev_pop("v").as("sigma"),
        median(col("v")).as("med")).head()
    val (mu, sigma, med) = (stats.getDouble(0), stats.getDouble(1),
      stats.getDouble(2))
    val mad = df.select(abs(col("v") - lit(med)).as("d"))
      .agg(median(col("d"))).head().getDouble(0)
    def zClassic(v: Double) = math.abs(v - mu) / sigma
    def zRobust(v: Double) = math.abs(v - med) / (1.4826 * mad)
    // σ-inflation: the modest spike is invisible to the classical test…
    assert(zClassic(15.0) < 3.0,
      f"classical z(15)=${zClassic(15.0)}%.2f should be blinded")
    assert(zClassic(1000.0) > 3.0)
    // …and both spikes clear the robust threshold, no baseline point does.
    assert(zRobust(15.0) > 3.0, f"robust z(15)=${zRobust(15.0)}%.2f")
    assert(zRobust(1000.0) > 3.0)
    assert(base.forall(v => zRobust(v) <= 3.0),
      "no baseline point may be flagged")
  }

  test("ADV-10 funnel: steps are STRICTLY ordered — out-of-order completions don't count") {
    // u1 completes in order; u2 purchased BEFORE clicking (no step 4);
    // u3 viewed before signup (view doesn't count; re-view after
    // signup does); u4 signup only.
    val ev = Seq(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      (1L, "purchase", 40L),
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "purchase", 25L),
      (2L, "click", 30L),
      (3L, "view", 5L), (3L, "signup", 10L), (3L, "view", 15L),
      (3L, "click", 20L), (3L, "purchase", 30L),
      (4L, "signup", 10L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = AdvancedQueries.funnelOver(spark, ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("1_signup", 4L, 1000000L),   // 4 signups
      ("2_view", 3L, 750000L),      // u4 never viewed
      ("3_click", 3L, 1000000L),    // all viewers clicked
      ("4_purchase", 2L, 666667L))) // u2's purchase preceded the click
    // Same-µs events do NOT chain (strictly-after): a click at the
    // exact view timestamp is not "after" it.
    val tie = Seq((9L, "signup", 1L), (9L, "view", 2L),
      (9L, "click", 2L)).toDF("user_id", "event_type", "ts_us")
    val t = AdvancedQueries.funnelOver(spark, tie)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(t.toSeq == Seq(("1_signup", 1L), ("2_view", 1L),
      ("3_click", 0L), ("4_purchase", 0L)))
  }
}
