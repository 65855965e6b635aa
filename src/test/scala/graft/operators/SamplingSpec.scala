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
