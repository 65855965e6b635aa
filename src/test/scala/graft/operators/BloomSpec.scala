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

  test("auto-selection: decision law, plan form, and row identity") {
    // The pure law: occupancy inversion hits the crossover where it
    // should. k=4, m=2^17 (q_ml21's geometry): 23k items set ~77k bits
    // (join form); 105k items set ~124k bits (packed — probed a step
    // past the boundary, since bitsFor's integer rounding can land the
    // exact-crossover inversion one item under); saturation is packed
    // by definition.
    val (k4, m17) = (4, 131072)
    def bitsFor(n: Long): Long =
      math.round(m17 * (1 - math.exp(-k4.toDouble * n / m17)))
    assert(!Bloom.choosePacked(bitsFor(23000L), k4, m17))
    assert(Bloom.choosePacked(bitsFor(105000L), k4, m17))
    assert(Bloom.choosePacked(m17.toLong, k4, m17))
    assert(!Bloom.choosePacked(0L, k4, m17))
    // Plan form follows the choice (word-aligned m=64 so the packed
    // path is eligible): below the crossover the executed plan is the
    // broadcast-join conjunction; an explicit nItems at the crossover
    // serves the codegen'd bloom_might_contain predicate.
    val m64 = 64
    val bloom = Bloom.build(members.toDF("item"), K, m64)
    // (Analyzed plans: over a LocalRelation probe table the optimizer's
    // ConvertToLocalRelation evaluates a pure Filter eagerly, so the
    // executed plan of the packed form is just the pre-computed scan.)
    val joinPlan = Bloom.filterMembersAuto(probes.toDF("item"), "item",
      bloom, K, m64).queryExecution.analyzed.toString
    assert(joinPlan.contains("Join") && !joinPlan.contains("bloom_might_contain"))
    val packedPlan = Bloom.filterMembersAuto(probes.toDF("item"), "item",
      bloom, K, m64, nItems = Some(Bloom.PackedCrossoverItems))
      .queryExecution.analyzed.toString
    assert(packedPlan.contains("bloom_might_contain") &&
      !packedPlan.contains("Join"))
    // The choice is semantically invisible: both serve the same rows.
    val viaJoin = Bloom.filterMembersAuto(probes.toDF("item"), "item",
      bloom, K, m64).collect().map(_.getString(0)).toSet
    val viaPacked = Bloom.filterMembersAuto(probes.toDF("item"), "item",
      bloom, K, m64, nItems = Some(Bloom.PackedCrossoverItems))
      .collect().map(_.getString(0)).toSet
    assert(viaJoin == viaPacked)
    // A non-word-aligned m stays on the join form even past the
    // crossover instead of refusing.
    assert(!Bloom.filterMembersAuto(probes.toDF("item"), "item",
      Bloom.build(members.toDF("item"), K, M), K, M,
      nItems = Some(Bloom.PackedCrossoverItems))
      .queryExecution.analyzed.toString.contains("bloom_might_contain"))
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
