package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** [[Bloom]] vs an independent driver-side reference filter built from
  * the same md5-parity hash ([[TF.hexHash60Local]]): the bit table
  * matches exactly, membership decisions — including false positives —
  * match the reference for every probe, no inserted item is ever
  * rejected, and filters merge by bit-set union (the cross-batch law a
  * streamed form relies on).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val M = 32 // tiny width forces collisions — FPs exercised

  // Kirsch-Mitzelmacher reference: bit_i = (h1 + i*h2) mod m, h2 odd.
  private def refPos(x: String, i: Int): Long = {
    val h1 = TF.hexHash60Local(s"b1:$x") % M
    val h2 = (TF.hexHash60Local(s"b2:$x") % M) | 1L
    (h1 + i * h2) % M
  }

  private def refBits(items: Seq[String]): Set[Long] =
    (for (x <- items; i <- 0 until K) yield refPos(x, i)).toSet

  private def refContains(bits: Set[Long], x: String): Boolean =
    (0 until K).forall(i => bits.contains(refPos(x, i)))

  private val members = (0 until 12).map(i => s"in$i")
  private val probes = members ++ (0 until 60).map(i => s"out$i")

  test("bit table matches the reference exactly") {
    val got = Bloom.build(members.toDF("item"), K, M)
      .collect().map(_.getLong(0)).toSet
    assert(got == refBits(members))
    assert(got.size <= M)
  }

  test("membership matches the reference per probe; no false negatives") {
    val bloom = Bloom.build(members.toDF("item"), K, M)
    val kept = Bloom.filterMembers(probes.toDF("item"), "item", bloom, K, M)
      .collect().map(_.getString(0)).toSet
    val bits = refBits(members)
    // Every inserted item survives (one-sided error)...
    members.foreach(x => assert(kept.contains(x), s"false negative on $x"))
    // ...and each probe's decision is the reference's, so the measured
    // false positives are exactly the hash-collision ones.
    probes.foreach(p => assert(kept.contains(p) == refContains(bits, p), p))
    // At m=32, k=3 with 12 members the array is near-saturated: the
    // probe set must actually exercise the FP path.
    assert((kept -- members).nonEmpty, "spec needs at least one FP to bite")
  }

  test("packed bitmap probe ≡ join-form probe, row for row") {
    // M=64 keeps one word; also run a 128-bit (2-word) geometry so the
    // word-index arithmetic is exercised across a boundary.
    for (m <- Seq(64, 128)) {
      val bloom = Bloom.build(members.toDF("item"), K, m)
      val joinForm = Bloom.filterMembers(probes.toDF("item"), "item",
        bloom, K, m).collect().map(_.getString(0)).toSet
      val packed = Bloom.filterMembersPacked(probes.toDF("item"), "item",
        bloom, K, m).collect().map(_.getString(0)).toSet
      assert(packed == joinForm, s"m=$m")
      members.foreach(x => assert(packed.contains(x), s"m=$m fn on $x"))
    }
    intercept[IllegalArgumentException] {
      Bloom.packFilter(Bloom.build(members.toDF("item"), K, M), 100)
    }
  }

  test("filters merge by union: build(A ++ B) == build(A) ∪ build(B)") {
    val (a, b) = members.splitAt(5)
    val merged = Bloom.build(a.toDF("item"), K, M)
      .unionByName(Bloom.build(b.toDF("item"), K, M))
      .distinct()
    val whole = Bloom.build(members.toDF("item"), K, M)
    assert(merged.collect().map(_.getLong(0)).toSet ==
      whole.collect().map(_.getLong(0)).toSet)
  }

  test("degenerate dims refuse loudly") {
    intercept[IllegalArgumentException] {
      Bloom.build(members.toDF("item"), 0, M)
    }
    intercept[IllegalArgumentException] {
      Bloom.filterMembers(probes.toDF("item"), "item",
        Bloom.build(members.toDF("item"), K, M), K, 0)
    }
  }
}
