package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-graph semantics for [[Graph.pageRank]] — structure must come
  * out in the ranks, independent of the oracle corpus.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: the star hub out-ranks its leaves; mass is conserved") {
    // Star: node 0 paired with 1..6. Symmetrized, the hub holds most of
    // the rank; leaves are symmetric and must tie exactly (per-round
    // rounding keeps their arithmetic identical).
    val pairs = (1L to 6L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val r = Graph.pageRank(pairs).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r(0L) > 2 * r(1L), s"hub must dominate: $r")
    assert((2L to 6L).forall(i => r(i) == r(1L)), s"leaves must tie exactly: $r")
    val mass = r.values.sum
    assert(math.abs(mass - 1.0) < 1e-6,
      s"no dangling nodes, so rank mass stays ~1: $mass")
  }

  test("triangleCounts: planted triangle credited to all three members, pendant absent") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val r = Graph.triangleCounts(pairs).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"exactly the triangle members, once each: $r")
  }

  test("triangleCounts: K4 gives three triangles per node") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val pairs = (for { a <- nodes; b <- nodes if a < b } yield (a, b))
      .toDF("doc_a", "doc_b")
    val r = Graph.triangleCounts(pairs).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(nodes.forall(n => r(n) == 3L), s"each K4 node sits in C(3,2)=3 triangles: $r")
  }

  test("pageRank: disconnected components rank independently") {
    // Two disjoint edges: all four nodes are structurally identical and
    // must receive the same rank.
    val pairs = Seq((0L, 1L), (10L, 11L)).toDF("doc_a", "doc_b")
    val ranks = Graph.pageRank(pairs).collect().map(_.getDouble(1)).distinct
    assert(ranks.length == 1, s"symmetric nodes must tie: ${ranks.mkString(",")}")
  }

  test("weighted pageRank: uniform weights reproduce the unweighted ranks exactly") {
    // w ≡ 2.0 (a power of two, so wsum and rank·w/wsum scale exactly):
    // proportional split with equal weights IS the uniform split.
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val weighted = Graph.pageRank(pairs.withColumn("w", lit(2.0)),
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = Graph.pageRank(pairs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(weighted == plain, s"uniform-weight ≠ unweighted: $weighted vs $plain")
  }

  test("weighted pageRank: rank follows the heavy edge") {
    // Path 1—2—3 where 2's edge to 1 carries 9× the weight of its edge
    // to 3: node 2 splits its rank 0.9/0.1, so 1 must out-rank 3 (the
    // unweighted ranks would tie by symmetry).
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.1)).toDF("doc_a", "doc_b", "w")
    val r = Graph.pageRank(pairs, weightCol = Some("w"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r(1L) > r(3L), s"heavy-edge endpoint must out-rank the light one: $r")
    val plain = Graph.pageRank(pairs)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(plain(1L) == plain(3L), s"unweighted path endpoints tie: $plain")
  }

  test("pageRank matches an independent driver-side reference on random graphs") {
    // Seeded pseudo-random weighted graphs; the reference is a plain
    // Scala re-implementation (adjacency maps, same per-round 9dp
    // rounding). Tolerance 1e-8: the only legitimate divergence is
    // neighbor-sum addition order at ~1e-16, absorbed by the rounding
    // except exactly at a boundary — 1e-8 admits one boundary flip of
    // the 9dp round without masking a real formula error (rank mass
    // per node is ≥ (1-d)/N ≈ 1e-2 on these graphs).
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 5 + rng.nextInt(8)
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rng.nextInt(3) == 0
      } yield (a, b, 0.01 + math.rint(rng.nextDouble() * 100) / 100.0)).toVector
      if (edges.nonEmpty) {
        val iters = 1 + rng.nextInt(4)
        // Reference: symmetrized weighted adjacency, uniform 1/N init.
        val out = edges.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val nodes = out.keys.toVector.sorted
        val nn = nodes.size.toDouble
        def rnd9(x: Double) = BigDecimal(x)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        var ranks = nodes.map(_ -> 1.0 / nn).toMap
        for (_ <- 1 to iters) {
          val contrib = collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
          for (u <- nodes; wsum = out(u).map(_._2).sum; (v, w) <- out(u))
            contrib(v) += ranks(u) * w / wsum
          ranks = nodes.map(nd => nd -> rnd9(0.15 / nn + 0.85 * contrib(nd))).toMap
        }
        val got = Graph.pageRank(edges.toDF("doc_a", "doc_b", "w"),
            iters = iters, weightCol = Some("w"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got.keySet == ranks.keySet, s"node sets differ: $got vs $ranks")
        for ((nd, r) <- ranks)
          assert(math.abs(got(nd) - r) <= 1e-8,
            s"node $nd: spark ${got(nd)} vs reference $r (n=$n iters=$iters edges=$edges)")
      }
    }
  }

  test("pageRankUntil ≡ fixed-iteration pageRank at the converged count") {
    // A chain (diameter 5) so convergence takes several rounds; the
    // eps-mode result must equal pageRank run for exactly the number of
    // rounds the convergence loop performed (same rounded round
    // sequence — the loop adds no arithmetic of its own).
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    var itersRun = 0
    val converged = Graph.pageRankUntil(pairs, eps = 1e-9,
        onIter = (i, _) => itersRun = i)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(itersRun > 2, s"chain must need several rounds, ran $itersRun")
    val fixed = Graph.pageRank(pairs, iters = itersRun)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(converged == fixed,
      s"converged ≠ fixed($itersRun): $converged vs $fixed")
    val mass = converged.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass stays ~1: $mass")
  }

  test("weighted pageRank: an all-zero-weight node dangles instead of emitting NaN") {
    // Node 2's only edges carry w=0, so its weight total is 0; the split
    // rank·w/wsum must not become 0/0 = NaN (which would poison every
    // reachable node's rank). Node 2 receives rank but distributes none.
    val pairs = Seq((1L, 2L, 0.0), (2L, 3L, 0.0), (1L, 3L, 1.0))
      .toDF("doc_a", "doc_b", "w")
    val r = Graph.pageRank(pairs, weightCol = Some("w"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L), s"all paired nodes present: $r")
    assert(r.values.forall(v => !v.isNaN), s"no NaN ranks: $r")
    // 1 and 3 exchange rank over their w=1 edge; 2 only accumulates the
    // teleport term (its zero-weight neighbors send nothing to it either
    // — their whole split goes along nonzero edges, of which they have
    // one each, to each other).
    assert(r(1L) == r(3L), s"1 and 3 are symmetric: $r")
    assert(r(2L) < r(1L), s"the dangling node keeps only teleport mass: $r")
  }

  test("pageRankUntil: empty pair graph converges to an empty frame, no throw") {
    // max(abs(Δ)) over zero rows aggregates to null; the loop must treat
    // that as converged (like fixed-iteration pageRank, which returns an
    // empty frame for the same input) rather than NPE on getDouble.
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Graph.pageRankUntil(empty, eps = 1e-9).collect().isEmpty)
    assert(Graph.pageRank(empty).collect().isEmpty)
  }

  test("pageRankUntil: plan depth stays one generation regardless of rounds") {
    // The per-iteration lazy localCheckpoint must truncate lineage: the
    // returned frame's analyzed plan is a checkpoint leaf, not O(iters)
    // unrolled rounds — the discipline dupClusters pins for its loop.
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    var itersRun = 0
    val res = Graph.pageRankUntil(pairs, eps = 1e-9, onIter = (i, _) => itersRun = i)
    val planSize = res.queryExecution.analyzed.collect { case p => p }.size
    assert(itersRun > 2, s"must iterate, ran $itersRun")
    assert(planSize <= 3,
      s"final plan must be a checkpoint leaf (+projection), got $planSize nodes:\n" +
        res.queryExecution.analyzed.treeString)
    // And the fixed-iteration single lazy plan DOES grow linearly — the
    // contrast that justifies the checkpoint in the eps mode.
    val lazySize = Graph.pageRank(pairs, iters = 5)
      .queryExecution.analyzed.collect { case p => p }.size
    assert(lazySize > planSize * 5, s"unrolled lazy plan should dwarf it: $lazySize")
  }
}
