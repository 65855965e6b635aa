package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** [[Sampling.bottomK]] vs a driver-side reference ranking: exact
  * membership, exact size, the merge law, the nested-prefix law, and
  * coordination across corpora — the properties that make min-wise
  * sampling the distributed/streamed sampling primitive.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def refRank(id: Long): Long = TF.hexHash60Local(s"smp:$id")

  private val ids: Seq[Long] = (0L until 500L by 3L) ++ (1000L until 1100L)
  private def df(s: Seq[Long]) = s.map(i => (i, s"doc $i")).toDF("doc_id", "text")

  private def sampleIds(s: Seq[Long], k: Int): Seq[Long] =
    Sampling.bottomK(df(s), "doc_id", k).orderBy("smp_rn")
      .collect().map(_.getLong(0)).toSeq

  test("membership and order match the reference ranking; size exact") {
    val got = sampleIds(ids, 40)
    val want = ids.sortBy(i => (refRank(i), i)).take(40)
    assert(got == want)
    assert(sampleIds(ids, 10000) == ids.sortBy(i => (refRank(i), i)),
      "k past n returns everything, ranked")
  }

  test("merge law: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))") {
    val (a, b) = ids.splitAt(ids.length / 2)
    val partial = (sampleIds(a, 25) ++ sampleIds(b, 25))
      .sortBy(i => (refRank(i), i)).take(25)
    assert(partial == sampleIds(ids, 25))
  }

  test("nested: the k-sample is a prefix of the 2k-sample") {
    assert(sampleIds(ids, 40).take(20) == sampleIds(ids, 20))
  }

  test("weightedBottomK: matches a driver-side ES reference; mass wins; w<=0 drops") {
    val rows = ids.map(i => (i, s"doc $i", if (i == 999999L) 0L else (i % 7) + 1L)) :+
      ((999999L, "zero-weight", 0L))
    val df = rows.toDF("doc_id", "text", "w")
    val got = Sampling.weightedBottomK(df, "doc_id", "w", 30)
      .orderBy("wr_rn").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // Reference: key = round(-ln((h+1)/2^60)/w, 6), smallest 30, id ties.
    val expected = rows.filter(_._3 > 0).map { case (i, _, w) =>
      val u = (TF.hexHash60Local(s"wsmp:$i") + 1).toDouble / 1152921504606846976.0e0
      val key = BigDecimal(-math.log(u) / w.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, key)
    }.sortBy { case (i, kk) => (kk, i) }.take(30)
    assert(got == expected)
    assert(!got.exists(_._1 == 999999L), "zero-weight rows carry no mass")
    // Popularity law: the expected key scales as 1/w, so the high-w
    // stratum (w=7: ids ≡ 6 mod 7) must dominate the low (w=1) one.
    val byW = got.map(_._1).groupBy(i => (i % 7) + 1)
    assert(byW.getOrElse(7L, Nil).size > byW.getOrElse(1L, Nil).size)
  }

  test("coordinated: shared rows sample identically across corpora") {
    val other = ids.filter(_ % 2 == 0) ++ Seq(7777L, 8888L)
    val inBoth = sampleIds(ids, 30).toSet intersect other.toSet
    // Every shared id that made corpus A's sample and ranks inside
    // corpus B's bottom-30 must appear in B's sample too — the ranks
    // are corpus-independent.
    val bSample = sampleIds(other, 30).toSet
    val bTop = other.sortBy(i => (refRank(i), i)).take(30).toSet
    inBoth.foreach { i =>
      assert(bSample.contains(i) == bTop.contains(i))
    }
    assert(intercept[IllegalArgumentException] {
      Sampling.bottomK(df(ids), "doc_id", 0)
    }.getMessage.contains("positive"))
  }
}
