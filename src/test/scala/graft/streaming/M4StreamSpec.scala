package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.analytics.EventQueries
import org.apache.spark.sql.functions._

/** The anchor-merge law makes the streamed chart EXACT: after any
  * prefix of batches the committed state equals the one-shot
  * fixed-grid M4 over every row seen — for ANY slicing of arrivals,
  * including out-of-order time ranges (every batch here contributes
  * to every bucket) and same-µs ties split across batches. The
  * coarsened read is pinned ≡ the batch operator run at the coarse
  * grain. Plus the family contract: replay skip, stale/grain
  * refusal, engine leg, fresh state.
  */
class M4StreamSpec extends SparkSpec {
  import spark.implicits._

  private val Grain = 100L // µs per fine bucket → 100 buckets over 0..9999

  // ts 0..9999 dealt round-robin to 3 batches (every bucket receives
  // rows from all batches — maximal merge pressure on first/last),
  // values scrambled per series; plus a same-µs tie pair whose two
  // rows arrive in DIFFERENT batches (5.0 in b0, 3.0 in b1 at ts=4200;
  // the one-shot tie law must still pick 3.0 as v_first if 4200 is the
  // bucket's first instant — and min/max regardless).
  private def slices: Seq[Seq[(String, Long, Double)]] = {
    val all = for (s <- Seq("a", "b"); t <- 0L until 10000L) yield
      (s, t, (((t * 7919) % 1000) / 10.0) + (if (s == "a") 0 else 500))
    val base = (0 until 3).map(b => all.filter(_._2 % 3 == b))
    Seq(base(0) :+ (("a", 4200L, 5.0)),
      base(1) :+ (("a", 4200L, 3.0)),
      base(2))
  }

  private def df(s: Seq[(String, Long, Double)]) =
    s.toDF("key", "ts_us", "value")

  /** One-shot fixed-grid reference over a union of arrivals. */
  private def oneShot(rows: Seq[(String, Long, Double)], grainUs: Long)
      : Set[Seq[Any]] =
    EventQueries.m4Anchors(
        df(rows).select(col("key").as("event_type"),
          expr(s"ts_us div $grainUs").as("bucket"),
          col("ts_us"), col("value")))
      .collect().map(_.toSeq).toSet

  private val anchorCols = Seq("event_type", "bucket", "n", "cents",
    "t_first_us", "t_last_us", "v_min", "v_max", "v_first", "v_last")

  private def committed(dir: String): Set[Seq[Any]] =
    M4Stream.anchors(spark, dir)
      .withColumnRenamed("key", "event_type")
      .select(anchorCols.head, anchorCols.tail: _*)
      .collect().map(_.toSeq).toSet

  test("streamed anchors == one-shot fixed-grid M4 after every batch; ties across batches resolve") {
    val dir = Files.createTempDirectory("graft-m4").toString
    var lastTotal = -1L
    val fn = M4Stream.pipeline(dir, Grain,
      onBatch = (_, total) => lastTotal = total)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      val seen = slices.take(i + 1).flatten
      assert(committed(dir) == oneShot(seen, Grain), s"after batch $i")
      assert(lastTotal == seen.size.toLong)
    }
  }

  test("coarsened read == batch M4 at the coarse grain over everything seen") {
    val dir = Files.createTempDirectory("graft-m4zoom").toString
    val fn = M4Stream.pipeline(dir, Grain)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val factor = 10
    val got = M4Stream.coarsened(spark, dir, factor)
      .withColumnRenamed("key", "event_type")
      .select(anchorCols.head, anchorCols.tail: _*)
      .collect().map(_.toSeq).toSet
    assert(got == oneShot(slices.flatten, Grain * factor))
  }

  test("smoothed read: streamed EWMA == driver-side exact recomputation over everything seen, BIT-identical") {
    val dir = Files.createTempDirectory("graft-m4ewma").toString
    val fn = M4Stream.pipeline(dir, Grain)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val win = 8
    val out = M4Stream.smoothed(spark, dir, win).collect()
    // Reference: bucket means from exact cents over the UNION of
    // arrivals, then the same left fold in ascending-bucket order.
    val means = slices.flatten.groupBy(p => (p._1, p._2 / Grain))
      .map { case ((k, b), xs) =>
        val cents = xs.map(p => math.round(p._3 * 100)).sum
        (k, b) -> (cents.toDouble / (100.0 * xs.size))
      }
    out.foreach { r =>
      val (k, b) = (r.getAs[String]("key"), r.getAs[Long]("bucket"))
      val frame = means.keys.filter(p => p._1 == k && p._2 <= b &&
        p._2 > b - win).toSeq.sortBy(_._2)
      val num = frame.foldLeft(0.0) { case (acc, p) =>
        acc + means(p) / (1L << (b - p._2)).toDouble }
      val den = frame.foldLeft(0.0) { case (acc, p) =>
        acc + 1.0 / (1L << (b - p._2)).toDouble }
      assert(r.getAs[Double]("ewma_v") == num / den, s"key $k bucket $b")
      assert(r.getAs[Double]("mean_v") == means((k, b)))
    }
  }

  test("anomalies read: streamed seasonal flags == driver-side recomputation (rounded-z row set)") {
    val dir = Files.createTempDirectory("graft-m4anom").toString
    val fn = M4Stream.pipeline(dir, Grain)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val period = 10L
    val got = M4Stream.anomalies(spark, dir, period, threshold = 1.5)
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("bucket"),
        r.getAs[Double]("z"))).toSet
    // Reference: means per bucket from exact cents; per (key, phase)
    // sample mean/std; flag |round(z, 4)| > 1.5.
    val means = slices.flatten.groupBy(p => (p._1, p._2 / Grain))
      .map { case ((k, b), xs) =>
        (k, b) -> (xs.map(p => math.round(p._3 * 100)).sum.toDouble /
          (100.0 * xs.size)) }
    val want = means.keys.groupBy(p => (p._1, p._2 % period))
      .flatMap { case (_, ks) =>
        val vs = ks.toSeq.sortBy(_._2).map(means)
        val mu = vs.sum / vs.size
        val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum /
          (vs.size - 1))
        if (sd <= 0) Seq.empty
        else ks.flatMap { p =>
          val z = BigDecimal((means(p) - mu) / sd)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (math.abs(z) > 1.5) Some((p._1, p._2, z)) else None
        }
      }.toSet
    assert(got == want, s"flag sets must match: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "fixture must actually flag something")
  }

  test("gapFilled read: dense per-key spine with LOCF means == driver-side recomputation") {
    val dir = Files.createTempDirectory("graft-m4gap").toString
    val fn = M4Stream.pipeline(dir, Grain)
    // Gappy corpus: key a observes buckets {2,3,7}, key b {5,6} (b's
    // spine must NOT extend to a's range), values with exact cents.
    val rows = Seq(("a", 250L, 1.25), ("a", 260L, 2.75), ("a", 399L, 4.0),
      ("a", 701L, 8.5), ("b", 520L, 3.5), ("b", 610L, 6.25))
    val (b0, b1) = rows.splitAt(3)
    fn(df(b0), 0L); fn(df(b1), 1L)
    val got = M4Stream.gapFilled(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("mean_ff"))).toSet
    // Reference: per key, spine lo..hi, n summed per bucket, mean =
    // cents/(100*n), LOCF forward.
    val byKB = rows.groupBy(p => (p._1, p._2 / Grain)).map { case (kb, xs) =>
      kb -> (xs.size.toLong,
        xs.map(p => math.round(p._3 * 100)).sum.toDouble / (100.0 * xs.size))
    }
    val want = byKB.keys.groupBy(_._1).flatMap { case (k, kbs) =>
      val (lo, hi) = (kbs.map(_._2).min, kbs.map(_._2).max)
      var lastMean = Double.NaN
      (lo to hi).map { b =>
        val (n, m) = byKB.getOrElse((k, b), (0L, lastMean))
        if (n > 0) lastMean = m
        (k, b, n, lastMean)
      }
    }.toSet
    assert(got == want, s"gapFilled:\n got $got\nwant $want")
    assert(got.exists(_._3 == 0L), "fixture must actually have gaps")
    assert(!got.exists(p => p._1 == "b" && (p._2 < 5L || p._2 > 6L)),
      "key b's spine must stay inside its own observed range")
  }

  test("state write is hash-partitioned: file count tracks anchor rows / targetRowsPerFile") {
    val dir = Files.createTempDirectory("graft-m4part").toString
    // ~200 anchors at Grain=100 over ts 0..9999 x 2 keys; 50 rows per
    // file -> the batch-2 rewrite lands in ceil(prev/50) >= 4 files.
    val fn = M4Stream.pipeline(dir, Grain, targetRowsPerFile = 50L)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(committed(dir) == oneShot(slices.flatten, Grain))
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = hfs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("gen-"))
      .map(_.stripPrefix("gen-").toLong).max
    val parts = hfs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/gen-$gen")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(parts.size >= 5, s"want >=5 parquet files, got ${parts.size}")
  }

  test("null ts_us rows are dropped before bucketing (meta discriminator survives)") {
    val dir = Files.createTempDirectory("graft-m4null").toString
    val fn = M4Stream.pipeline(dir, Grain)
    val dirty = df(slices.head).unionByName(
      Seq(("a", Option.empty[Long], Option(9.0)),
          (null.asInstanceOf[String], Option.empty[Long], Option(1.0)))
        .toDF("key", "ts_us", "value"))
    fn(dirty, 0L)
    // A null-bucket anchor committed into state would make readMeta
    // see 2 meta rows and throw on EVERY later batch; instead the
    // state equals the clean batch's and the stream keeps running.
    assert(committed(dir) == oneShot(slices.head, Grain))
    fn(df(slices(1)), 1L)
    assert(committed(dir) == oneShot(slices.take(2).flatten, Grain))
  }

  test("anomalies phase is pmod: pre-epoch buckets share the phase of their hour-of-day") {
    val dir = Files.createTempDirectory("graft-m4pmod").toString
    val fn = M4Stream.pipeline(dir, Grain)
    // Buckets -7..6 (ts straddles the epoch): with % the same phase
    // p would split into p and p-period groups; with pmod every
    // bucket lands in [0, period) and -7 % 10 joins phase 3.
    // Exact bucket multiples: Spark's integral div truncates toward
    // zero, so an off-grid negative ts would land one bucket high.
    val rows = for (b <- -7L to 6L) yield
      ("a", b * Grain, (b % 3).toDouble)
    fn(df(rows), 0L)
    val phases = M4Stream.anomalies(spark, dir, period = 10L,
        threshold = -1.0) // threshold below any |z|: keep all sd>0 rows
      .select("bucket", "phase").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(phases.nonEmpty)
    assert(phases.forall { case (_, p) => p >= 0L && p < 10L },
      s"negative phase leaked: ${phases.mkString(",")}")
    assert(phases.toMap.get(-7L).contains(3L) &&
      phases.toMap.get(3L).contains(3L),
      "bucket -7 must share phase 3 with bucket 3")
  }

  test("replay skips; stale and mismatched grain refuse; fresh state is empty") {
    val dir = Files.createTempDirectory("graft-m4replay").toString
    assert(M4Stream.anchors(spark, dir).count() == 0L)
    val fn = M4Stream.pipeline(dir, Grain)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val metaBefore = M4Stream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(committed(dir) == before)
    assert(M4Stream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) }
    intercept[IllegalStateException] {
      M4Stream.pipeline(dir, Grain * 2)(df(slices.head), 9L)
    }
    intercept[IllegalArgumentException] { M4Stream.pipeline(dir, 0L) }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot chart") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-m4engine").toString
    val fn = M4Stream.pipeline(dir, Grain)
    val mem = MemoryStream[(String, Long, Double)]
    val q = mem.toDF().toDF("key", "ts_us", "value")
      .writeStream.foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(committed(dir) == oneShot(slices.flatten, Grain))
  }
}
