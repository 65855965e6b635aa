package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic iterative graph dataflow over pair tables — the weighted
  * companion to [[Dedup.dupClusters]]'s min-label propagation. Inputs
  * are the same near-dup pair graphs the DD family emits; at 100 TB the
  * pair graph is the small verified-candidate output, so whole-graph
  * iteration is cheap relative to the corpus passes that produced it.
  */
object Graph {

  /** PageRank with a FIXED iteration count over an undirected pair
    * graph (symmetrized internally; every node therefore has out-degree
    * ≥ 1, so there is no dangling-mass term). Returns (`node`, `rank`)
    * for every node in ≥ 1 pair.
    *
    * Deliberately a SINGLE lazy plan: with `iters` fixed there is no
    * convergence count, so the whole computation — degree table,
    * `iters` unrolled join+aggregate rounds, final projection — is one
    * declarative composition with zero driver actions. The edge list
    * is referenced 2 + 2·iters times, but does NOT need caching:
    * within one physical plan Spark replaces the identical subtrees
    * with ReusedExchange, so the upstream pair pipeline executes once
    * (measured on q_adv7: the lazy form beat an eager memoized edge
    * list 3.3 s vs 4.6 s — the extra materialization pass bought
    * nothing; contrast dupClusters, whose per-ITERATION actions are
    * separate jobs and genuinely recompute without its persist). Plan
    * depth grows LINEARLY in `iters` (each round references the
    * previous ranks once — no pointer-jump self-join doubling), so no
    * lineage cap is needed at the shipped iteration counts; callers
    * looping to convergence instead should adopt dupClusters'
    * per-iteration lazy localCheckpoint.
    *
    * Cross-engine determinism (the q_adv7 oracle unrolls the identical
    * rounds in SQL): per-round ranks are rounded to 9dp — neighbor-sum
    * addition order differs between engines at ~1e-16 while rank mass
    * sits at ≥ 1e-6, so the rounding absorbs it round by round instead
    * of letting it compound across iterations.
    */
  /** Per-node triangle counts over an undirected pair graph — the
    * density signal that separates genuine duplicate FAMILIES (near-dup
    * clusters are triangle-rich: pairwise-similar members) from chance
    * LSH collisions (isolated edges close no triangles). Input pairs
    * must be canonical (`aCol` < `bCol`, as every DD pair emitter
    * produces); each triangle {a<b<c} is found exactly once as the path
    * a→b→c closed by the a→c edge, then credited to all three members.
    *
    * All-integer arithmetic — no cross-engine float surface at all.
    * Shape at scale: one self-join on the middle node (cost Σ deg² of
    * the PAIR graph, not the corpus) + one semi-join closure + an
    * explode-aggregate; this is the standard degree-ordered wedge
    * enumeration, with the orientation given for free by the canonical
    * id ordering.
    */
  def triangleCounts(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("b").as("b2"), col("a").as("bmid")),
        col("b") === col("bmid"))
      .select(col("a"), col("b"), col("b2").as("c"))
    val tris = wedges.join(e.select(col("a").as("ta"), col("b").as("tc")),
      col("a") === col("ta") && col("c") === col("tc"), "left_semi")
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  def pageRank(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", damping: Double = 0.85,
      iters: Int = 5): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"))
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    val init = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    (1 to iters).foldLeft(init) { (ranks, _) =>
      val contrib = sym
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * coalesce(col("s"), lit(0.0)), 9).as("rank"))
    }
  }
}
