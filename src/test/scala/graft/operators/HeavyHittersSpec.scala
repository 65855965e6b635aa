package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The synthetic corpus is near-uniform, so the oracled query never
  * stresses the sketch; these tests plant real skew (far more distinct
  * items than sketch capacity) so eviction and the merge's counter
  * restoration actually run, and pin the two properties that matter:
  * the Misra-Gries guarantee (no φ-frequent item is ever lost) and
  * end-to-end exactness (output ≡ the exact filtered GROUP BY).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Planted Zipf-ish stream: items "h0".."h4" are genuinely heavy
  // (1400, 1200, 1000, 800, 600 of ~9.1k), plus 4000 singletons and a
  // band of 100 mid-items at 10 each — distinct (4105) >> capacity, so
  // map-side eviction fires constantly.
  private def skewed = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(1400 - 200 * i)(s"h$i"))
    val mid = (0 until 100).flatMap(i => Seq.fill(10)(s"m$i"))
    val tail = (0 until 4000).map(i => s"t$i")
    val rnd = new scala.util.Random(42) // deterministic interleave
    spark.createDataset(rnd.shuffle((heavy ++ mid ++ tail).toVector))
      .repartition(8)
  }

  test("guarantee: every φ-frequent item survives the sketch under eviction") {
    val items = skewed
    val n = items.count()
    // φ = 5% → all of h0..h4 (6.6%..15.4%) must appear; m = 32 keeps
    // m+1 > 1/φ while being far below the 4105 distinct items.
    val out = HeavyHitters.frequentItems(items, num = 5, denom = 100, m = 32)
      .collect()
    val got = out.map(_.getString(0)).toSet
    assert(Set("h0", "h1", "h2", "h3", "h4").subsetOf(got))
    // exact counts, not sketch undercounts
    val counts = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("h0") == 1400 && counts("h1") == 1200)
    // and nothing below the threshold sneaks in
    out.foreach(r => assert(r.getLong(1) * 100 >= n * 5))
  }

  test("end-to-end ≡ exact filtered GROUP BY") {
    val items = skewed
    val n = items.count()
    val exact = items.toDF("item").groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") * 1000 >= lit(n) * 11) // φ = 1.1%: h0..h4 + nothing else
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.frequentItems(items, num = 11, denom = 1000, m = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.map(_._1) == Set("h0", "h1", "h2", "h3", "h4"))
  }

  test("capacity below the soundness bound is refused") {
    val items = Seq("a", "b").toDS()
    intercept[IllegalArgumentException] {
      // φ = 1% needs m+1 > 100
      HeavyHitters.frequentItems(items, num = 1, denom = 100, m = 64)
    }
  }

  test("empty input yields an empty, well-typed result") {
    val out = HeavyHitters.frequentItems(spark.emptyDataset[String],
      num = 1, denom = 10, m = 16)
    assert(out.columns.toSeq == Seq("item", "n", "share"))
    assert(out.count() == 0)
  }

  test("share is the exact fraction rounded to 6dp") {
    val items = (Seq.fill(60)("x") ++ Seq.fill(40)("y")).toDS()
    val rows = HeavyHitters.frequentItems(items, num = 1, denom = 4, m = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("x", 60L, 0.6), ("y", 40L, 0.4)))
  }
}
