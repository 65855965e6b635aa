package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DDSketch]] vs an independent driver-side reference built from the
  * same 9dp-rounded log-γ bucket arithmetic: the bucket table matches
  * cell-for-cell, every quantile estimate honors the relative-error
  * guarantee against the exact order statistic, and sketches merge by
  * addition (the cross-batch law [[graft.streaming.DDSketchStream]]
  * relies on).
  */
class DDSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Alpha = 0.02

  /** Reference bucket index — the operator's documented arithmetic,
    * re-derived independently.
    */
  private def refBucket(x: Double, alpha: Double): Long = {
    val lnG = math.log((1 + alpha) / (1 - alpha))
    math.ceil(BigDecimal(math.log(x) / lnG)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
  }

  // Skewed planted values: log-uniform-ish spread over 4 decades plus
  // heavy ties at 100.0 (quantile walks must handle mass concentration).
  private val values: Seq[Double] =
    (1 to 200).map(i => math.pow(10, 4.0 * i / 200) * (1 + (i % 7) * 0.01)) ++
      Seq.fill(50)(100.0)

  test("bucket table matches the reference cell-for-cell") {
    val got = DDSketch.sketch(values.toDF("value"), Alpha)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = values.groupBy(refBucket(_, Alpha)).view.mapValues(_.size.toLong)
    assert(got == ref.toMap)
  }

  test("every quantile estimate is within relative alpha of the exact order statistic") {
    for (alpha <- Seq(0.01, 0.02, 0.05)) {
      val sk = DDSketch.sketch(values.toDF("value"), alpha)
      val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
      val est = DDSketch.quantiles(sk, alpha, qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = values.sorted
      for (q <- qs) {
        val rank = math.max(1, math.ceil(q * sorted.size).toInt)
        val exact = sorted(rank - 1)
        val relErr = math.abs(est(q) - exact) / exact
        assert(relErr <= alpha + 1e-6,
          s"alpha=$alpha q=$q est=${est(q)} exact=$exact relErr=$relErr")
      }
    }
  }

  test("sketches merge by addition: sketch(A ++ B) == sketch(A) + sketch(B)") {
    val (a, b) = values.splitAt(values.size / 3)
    val merged = DDSketch.sketch(a.toDF("value"), Alpha)
      .unionByName(DDSketch.sketch(b.toDF("value"), Alpha))
      .groupBy("bucket").agg(sum("n").as("n"))
    val whole = DDSketch.sketch(values.toDF("value"), Alpha)
    assert(merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      whole.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("non-positive values are outside the log grid and dropped; bad params refuse") {
    val sk = DDSketch.sketch(Seq(-5.0, 0.0, 2.0).toDF("value"), Alpha)
    assert(sk.agg(sum("n")).head().getLong(0) == 1L)
    intercept[IllegalArgumentException] { DDSketch.gamma(0.0) }
    intercept[IllegalArgumentException] { DDSketch.gamma(1.0) }
    intercept[IllegalArgumentException] {
      DDSketch.quantiles(sk, Alpha, Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      DDSketch.quantiles(sk, Alpha, Seq.empty)
    }
  }

  test("state stays bucket-bounded: 100x more rows, same bucket count") {
    val small = DDSketch.sketch(values.toDF("value"), Alpha).count()
    val big = DDSketch.sketch(
      Seq.fill(100)(values).flatten.toDF("value"), Alpha).count()
    assert(small == big, "row count must not grow the bucket table")
  }
}
