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

  // Pathological 16-decade log-uniform corpus: ~900 buckets at
  // alpha=0.02 — the range nothing bounds without the collapsing cap.
  private val wide: Seq[Double] =
    (1 to 800).map(i => math.pow(10, -8 + 16.0 * i / 800))

  test("collapsing cap: m enforced; upper quantiles EXACTLY the uncapped sketch's; low ones degrade one-sidedly") {
    val m = 64
    val sk = DDSketch.sketch(wide.toDF("value"), Alpha)
    assert(sk.count() > 500, "fixture must actually exceed the cap")
    val capped = DDSketch.collapse(sk, m)
    assert(capped.count() == m.toLong, "cap must be exact")
    // Mass is conserved.
    assert(capped.agg(sum("n")).head().getLong(0) ==
      sk.agg(sum("n")).head().getLong(0))
    val qs = Seq(0.1, 0.5, 0.95, 0.99, 1.0)
    def est(s: org.apache.spark.sql.DataFrame) =
      DDSketch.quantiles(s, Alpha, qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val (full, cap) = (est(sk), est(capped))
    // Above the cutoff (~top 8% of mass here): IDENTICAL doubles —
    // collapsing only moved mass below, cumulative counts unchanged.
    for (q <- Seq(0.95, 0.99, 1.0)) {
      assert(cap(q) == full(q), s"q=$q capped=${cap(q)} full=${full(q)}")
      val sorted = wide.sorted
      val exact = sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      assert(math.abs(cap(q) - exact) / exact <= Alpha + 1e-6,
        s"alpha guarantee must survive the cap at q=$q")
    }
    // At/below the cutoff: one-sided — the cutoff midpoint is an
    // OVERestimate, never an underestimate.
    for (q <- Seq(0.1, 0.5)) assert(cap(q) >= full(q), s"q=$q")
    // A sketch within the cap is untouched (cutoff = global min).
    val smallSk = DDSketch.sketch(values.toDF("value"), Alpha)
    assert(DDSketch.collapse(smallSk, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      smallSk.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    intercept[IllegalArgumentException] { DDSketch.collapse(sk, 1) }
  }

  test("collapse is merge-compatible: collapse(collapse(A)+B) == collapse(A+B) cell-for-cell") {
    val m = 48
    val (a, b) = wide.splitAt(wide.size / 2) // A low decades, B high
    def plus(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      x.unionByName(y).groupBy("bucket").agg(sum("n").as("n"))
    def cells(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val skA = DDSketch.sketch(a.toDF("value"), Alpha)
    val skB = DDSketch.sketch(b.toDF("value"), Alpha)
    val streamedShape = DDSketch.collapse(plus(DDSketch.collapse(skA, m), skB), m)
    val oneShot = DDSketch.collapse(plus(skA, skB), m)
    assert(cells(streamedShape) == cells(oneShot))
    // And in the other arrival order (B's high decades first).
    val reversed = DDSketch.collapse(plus(DDSketch.collapse(skB, m), skA), m)
    assert(cells(reversed) == cells(oneShot))
  }

  test("keyed collapse: m enforced per key; a within-cap key is untouched") {
    val m = 32
    val rows = wide.map(v => ("wide", v)) ++
      values.take(15).map(v => ("narrow", v))
    val sk = DDSketch.sketchBy(rows.toDF("key", "value"), Alpha, Seq("key"))
    val capped = DDSketch.collapseBy(sk, m, Seq("key"))
    val byKey = capped.groupBy("key").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("wide") == m.toLong)
    val narrowBefore = sk.where(col("key") === "narrow").count()
    assert(narrowBefore < m, "fixture: narrow key must be within cap")
    assert(byKey("narrow") == narrowBefore)
    // Per-key totals conserved.
    val tBefore = sk.groupBy("key").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tAfter = capped.groupBy("key").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tBefore == tAfter)
  }

  test("valueCum two-level ≡ single-window walk; no partition-less window in the build (round 21)") {
    import org.apache.spark.sql.execution.window.WindowExec
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    def globalWindows(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.size
    // Unkeyed: planted values spanning exponent-group boundaries —
    // exact powers of two (where a 1-ulp log2 error flips the group:
    // harmless, groups only need monotonicity), ties, subnormal-range,
    // non-positive (filtered), multi-group spreads.
    val vals = (values ++ Seq(8.0, 8.0, 4.0, 0.5, 1.0, 2.0, 1e-300,
      3.0, 0.0, -5.0)).toDF("value")
    assert(rows(DDSketch.valueCumTwoLevel(vals)) ==
      rows(DDSketch.valueCumSingleWindow(vals)))
    assert(globalWindows(DDSketch.valueCumTwoLevel(vals)) == 0,
      "the artifact build must not contain a partition-less window")
    assert(globalWindows(DDSketch.valueCumSingleWindow(vals)) > 0,
      "detector sanity: the reference walk IS the global window")
    // Keyed: per-key cums and totals, keys with disjoint value ranges.
    val keyed = (values.map(("a", _)) ++ Seq(("b", 8.0), ("b", 8.0),
      ("b", 2.0), ("b", 1e9), ("c", 0.25))).toDF("event_type", "value")
    assert(rows(DDSketch.valueCumTwoLevel(keyed, Seq("event_type"))) ==
      rows(DDSketch.valueCumSingleWindow(keyed, Seq("event_type"))))
    assert(globalWindows(DDSketch.valueCumTwoLevel(keyed, Seq("event_type"))) == 0)
  }
}
