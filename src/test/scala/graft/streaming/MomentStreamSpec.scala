package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** Exact additivity of the decimal moment state makes the streamed
  * statistics table EXACT: after any prefix of batches the committed
  * moments equal a driver-side BigDecimal fold over the union of all
  * delivered rows — bit-identical, any slicing — and the derived
  * corr/slope/intercept/r² match an independent recompute from those
  * same moments. Plus the family contract: replay skip, stale refuse,
  * scale refuse, null guard, degenerate keys, fresh read, engine leg.
  */
class MomentStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Pt = (String, Double, Double) // key, x, y

  private def quant(v: Double): BigInt =
    BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt

  /** Driver reference: per key, exact integer moments over the
    * micro-quantized coordinates.
    */
  private def refMoments(pts: Seq[Pt])
      : Map[String, (Long, BigInt, BigInt, BigInt, BigInt, BigInt)] =
    pts.groupBy(_._1).map { case (k, ps) =>
      val q = ps.map(p => (quant(p._2), quant(p._3)))
      k -> (ps.size.toLong, q.map(_._1).sum, q.map(_._2).sum,
        q.map(p => p._1 * p._1).sum, q.map(p => p._2 * p._2).sum,
        q.map(p => p._1 * p._2).sum)
    }

  private def committed(dir: String)
      : Map[String, (Long, BigInt, BigInt, BigInt, BigInt, BigInt)] =
    MomentStream.moments(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1),
        r.getDecimal(2).toBigInteger: BigInt,
        r.getDecimal(3).toBigInteger: BigInt,
        r.getDecimal(4).toBigInteger: BigInt,
        r.getDecimal(5).toBigInteger: BigInt,
        r.getDecimal(6).toBigInteger: BigInt)
    }.toMap

  private def df(s: Seq[Pt]) = s.toDF("key", "x", "y")

  private def corpus(seed: Int): Seq[Pt] = {
    val rnd = new Random(seed)
    for {
      k <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield {
      val x = rnd.nextDouble() * 20 - 10
      // correlated y with per-key slope and noise
      (k, x, (k.head - 'a' + 1) * 1.5 * x + rnd.nextGaussian() * 2)
    }
  }

  private def slice(pts: Seq[Pt], n: Int, seed: Int): Seq[Seq[Pt]] = {
    val rnd = new Random(seed)
    val tagged = pts.map(p => (rnd.nextInt(n), p))
    (0 until n).map(b => tagged.filter(_._1 == b).map(_._2))
      .filter(_.nonEmpty)
  }

  test("committed moments == driver BigDecimal fold BIT-IDENTICALLY after every batch, any slicing") {
    for (seed <- Seq(2, 9)) {
      val dir = Files.createTempDirectory(s"graft-mom$seed").toString
      val fn = MomentStream.pipeline(dir)
      val slices = slice(corpus(seed), 4, seed + 50)
      slices.zipWithIndex.foreach { case (s, i) =>
        fn(df(s), i.toLong)
        assert(committed(dir) == refMoments(slices.take(i + 1).flatten),
          s"seed=$seed after batch $i")
      }
    }
  }

  test("stats read: corr/slope/intercept/r2 match an independent recompute from the exact moments") {
    val dir = Files.createTempDirectory("graft-momstats").toString
    val fn = MomentStream.pipeline(dir)
    val slices = slice(corpus(4), 3, 8)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val ref = refMoments(slices.flatten).map { case (k, m) =>
      val (n, sx, sy, sxx, syy, sxy) = m
      val bn = BigInt(n)
      val covN = (sxy * bn - sx * sy).toDouble
      val varXN = (sxx * bn - sx * sx).toDouble
      val varYN = (syy * bn - sy * sy).toDouble
      val corr = covN / math.sqrt(varXN) / math.sqrt(varYN)
      val slope = covN / varXN
      val icept = (sy.toDouble - slope * sx.toDouble) / n / 1e6
      k -> (n, corr, slope, icept, corr * corr)
    }
    val got = MomentStream.stats(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
    }.toMap
    assert(got.keySet == ref.keySet)
    for (k <- ref.keys) {
      val (gn, gc, gs, gi, gr) = got(k)
      val (rn, rc, rs, ri, rr) = ref(k)
      assert(gn == rn, s"n($k)")
      assert(math.abs(gc - rc) < 1e-12, s"corr($k): $gc vs $rc")
      assert(math.abs(gs - rs) < 1e-12 * math.abs(rs), s"slope($k)")
      assert(math.abs(gi - ri) < 1e-9, s"intercept($k): $gi vs $ri")
      assert(math.abs(gr - rr) < 1e-12, s"r2($k)")
    }
    // The planted per-key slopes (1.5/3.0/4.5) are recovered to the
    // noise level — the read is a real fit, not a formula identity.
    assert(math.abs(got("a")._3 - 1.5) < 0.2)
    assert(math.abs(got("c")._3 - 4.5) < 0.2)
  }

  test("meanVar read: per-key mean/variance/stddev match the BigDecimal recompute; single-point keys read null variance") {
    val dir = Files.createTempDirectory("graft-mommv").toString
    val fn = MomentStream.pipeline(dir)
    val slices = slice(corpus(5), 3, 6)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val ref = refMoments(slices.flatten).map { case (k, m) =>
      val (n, _, sy, _, syy, _) = m
      val mean = sy.toDouble / n / 1e6
      val varY = (syy * BigInt(n) - sy * sy).toDouble / n / n / 1e12
      k -> (n, mean, varY)
    }
    val got = MomentStream.meanVar(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    }.toMap
    assert(got.keySet == ref.keySet)
    for ((k, (n, mean, varY)) <- ref) {
      assert(got(k)._1 == n)
      assert(math.abs(got(k)._2 - mean) < 1e-12, s"mean($k)")
      assert(math.abs(got(k)._3 - varY) < 1e-9, s"var($k)")
      assert(math.abs(got(k)._4 - math.sqrt(varY)) < 1e-9, s"std($k)")
    }
    // Single-point key: mean defined, variance/stddev null.
    val one = Files.createTempDirectory("graft-mommv1").toString
    MomentStream.pipeline(one)(df(Seq(("solo", 2.0, 3.5))), 0L)
    val r = MomentStream.meanVar(spark, one).collect().head
    assert(r.getDouble(2) == 3.5 && r.isNullAt(3) && r.isNullAt(4))
  }

  test("degenerate keys read null: single point, zero x-variance, zero y-variance") {
    val dir = Files.createTempDirectory("graft-momdegen").toString
    val fn = MomentStream.pipeline(dir)
    val pts: Seq[Pt] = Seq(("one", 1.0, 2.0),
      ("flatx", 3.0, 1.0), ("flatx", 3.0, 2.0), ("flatx", 3.0, 3.0),
      ("flaty", 1.0, 7.0), ("flaty", 2.0, 7.0))
    fn(df(pts), 0L)
    val rows = MomentStream.stats(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) &&
        r.isNullAt(5), s"key ${r.getString(0)} should read all-null stats")
    }
  }

  test("replay skips; stale refuses; null key/x/y rows drop; fresh state reads empty") {
    val dir = Files.createTempDirectory("graft-momguards").toString
    assert(MomentStream.moments(spark, dir).count() == 0L)
    val fn = MomentStream.pipeline(dir)
    val slices = slice(corpus(6), 3, 7)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val metaBefore = MomentStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(committed(dir) == before)
    assert(MomentStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    val withNulls =
      Seq[(String, java.lang.Double, java.lang.Double)](
        (null, 1.0, 1.0), ("k", null, 1.0), ("k", 1.0, null))
        .toDF("key", "x", "y")
    fn(withNulls, slices.size.toLong) // all rows drop; state unchanged
    assert(committed(dir) == before)
  }

  test("under the streaming engine: MemoryStream batches converge to the fold") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-momengine").toString
    val fn = MomentStream.pipeline(dir)
    val mem = MemoryStream[Pt]
    val q = mem.toDF().toDF("key", "x", "y")
      .writeStream.foreachBatch(fn).start()
    val slices = slice(corpus(12), 3, 14)
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(committed(dir) == refMoments(slices.flatten))
  }
}
