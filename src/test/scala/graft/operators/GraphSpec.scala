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
}
