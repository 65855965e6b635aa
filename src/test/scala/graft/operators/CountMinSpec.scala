package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** [[CountMin]] vs an independent driver-side reference sketch built
  * from the same md5-parity hash ([[TF.hexHash60Local]]): the table
  * CONTENT matches cell-for-cell, estimates match a reference
  * implementation over every vocabulary item, the deterministic
  * est ≥ true guarantee holds, and sketches merge by addition (the
  * cross-batch law a streamed form relies on).
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 3
  private val W = 8 // tiny width forces collisions — overcounts exercised

  /** Reference CMS: d×w counter array from the raw stream. */
  private def refSketch(stream: Seq[String]): Array[Array[Long]] = {
    val cells = Array.fill(D, W)(0L)
    for (tok <- stream; i <- 0 until D)
      cells(i)((TF.hexHash60Local(s"$i:$tok") % W).toInt) += 1
    cells
  }

  private def refEstimate(cells: Array[Array[Long]], tok: String): Long =
    (0 until D).map(i => cells(i)((TF.hexHash60Local(s"$i:$tok") % W).toInt)).min

  // Skewed planted stream: "alpha" dominates, singletons collide at w=8.
  private val stream: Seq[String] =
    Seq.fill(40)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(5)("gamma") ++
      (0 until 20).map(i => s"rare$i")

  test("sketch table matches the reference cell-for-cell") {
    val sk = CountMin.sketch(stream.toDF("item"), D, W)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    val ref = refSketch(stream)
    for (i <- 0 until D; b <- 0 until W) {
      assert(sk.getOrElse((i, b), 0L) == ref(i)(b), s"cell ($i, $b)")
    }
    // Conservation: every hash row counts every token once.
    assert(sk.values.sum == D.toLong * stream.length)
  }

  test("estimates match the reference; est >= true for every vocab item") {
    val sk = CountMin.sketch(stream.toDF("item"), D, W)
    val vocab = stream.distinct
    val est = CountMin.estimates(vocab.toDF("item"), sk, D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = refSketch(stream)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (tok <- vocab) {
      assert(est(tok) == refEstimate(ref, tok), s"estimate of $tok")
      assert(est(tok) >= truth(tok), s"CMS must never undercount $tok")
    }
    // The dominant item's estimate is exact unless all three of its
    // cells collide — at this skew its min-cell is itself-dominated.
    assert(est("alpha") >= 40L)
  }

  test("sketches merge by addition: sketch(A ++ B) == sketch(A) + sketch(B)") {
    val (a, b) = stream.splitAt(stream.length / 3)
    val merged = CountMin.sketch(a.toDF("item"), D, W)
      .unionByName(CountMin.sketch(b.toDF("item"), D, W))
      .groupBy("hrow", "bucket").agg(sum("c").as("c"))
    val whole = CountMin.sketch(stream.toDF("item"), D, W)
    val mm = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ww = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mm == ww)
  }

  test("joinSizeEstimate: matches the reference inner product; never undercounts the true join size") {
    val a = stream
    val b = Seq.fill(25)("alpha") ++ Seq.fill(9)("gamma") ++
      (0 until 15).map(i => s"other$i")
    val est = CountMin.joinSizeEstimate(
        CountMin.sketch(a.toDF("item"), D, W),
        CountMin.sketch(b.toDF("item"), D, W))
      .head().getLong(0)
    // Reference: min over rows of the cellwise inner product.
    val (ra, rb) = (refSketch(a), refSketch(b))
    val refEst = (0 until D).map(i =>
      (0 until W).map(bkt => ra(i)(bkt) * rb(i)(bkt)).sum).min
    assert(est == refEst)
    // True join size = sum of frequency products; CM only overcounts.
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = fa.keySet.intersect(fb.keySet).toSeq
      .map(x => fa(x) * fb(x)).sum
    assert(est >= truth, s"est $est < true $truth")
    assert(truth > 0, "fixture must exercise a non-empty join")
  }

  test("decision law: thresholding the estimate picks the plan truth picks, in the safe direction") {
    // Planted small-join / large-join pair (q_txt23's shape): the
    // distinct projections intersect in a handful of rows, the
    // occurrence streams multiply heavy hitters into thousands.
    val a = stream
    val b = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      (0 until 10).map(i => s"b$i")
    def estOf(x: Seq[String], y: Seq[String]): Long =
      CountMin.joinSizeEstimate(
        CountMin.sketch(x.toDF("item"), D, W),
        CountMin.sketch(y.toDF("item"), D, W)).head().getLong(0)
    def truthOf(x: Seq[String], y: Seq[String]): Long = {
      val fx = x.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fy = y.groupBy(identity).view.mapValues(_.size.toLong).toMap
      fx.keySet.intersect(fy.keySet).toSeq.map(k => fx(k) * fy(k)).sum
    }
    val threshold = 100L
    for ((x, y) <- Seq((a, b), (a.distinct, b.distinct))) {
      val (est, truth) = (estOf(x, y), truthOf(x, y))
      assert(est >= truth)
      // CMS only overcounts, so the one possible disagreement is
      // broadcast-sized joins priced into the shuffle tier — never a
      // shuffle-sized join priced broadcast (the OOM direction).
      if (truth > threshold) assert(est > threshold,
        "a large join can never be mispriced as broadcast")
    }
    // And at this fixture both decisions agree on both scenarios.
    assert(truthOf(a, b) > threshold && estOf(a, b) > threshold)
    assert(truthOf(a.distinct, b.distinct) <= threshold &&
      estOf(a.distinct, b.distinct) <= threshold)
  }

  test("absent item reads 0 through an empty cell; left join coalesces") {
    // A single-token stream leaves w-1 buckets empty in every row: any
    // probe that misses in at least one row must estimate 0.
    val sk = CountMin.sketch(Seq("only").toDF("item"), D, W)
    val probes = (0 until 50).map(i => s"absent$i").filter { p =>
      (0 until D).exists(i =>
        TF.hexHash60Local(s"$i:$p") % W != TF.hexHash60Local(s"$i:only") % W)
    }
    assert(probes.nonEmpty)
    val est = CountMin.estimates(probes.toDF("item"), sk, D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach(p => assert(est(p) == 0L, s"probe $p"))
  }
}
