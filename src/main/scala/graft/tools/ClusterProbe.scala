package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Diagnostic main for [[graft.operators.Dedup.dupClusters]] — the
  * q_dd9 fixpoint. Two modes:
  *
  *  - default: runs the exact q_dd9 pair pipeline (MinHash-LSH over
  *    documents, md5 parity) at the given SF and prints per-iteration
  *    wall time + changed-label counts, then total wall time.
  *    `runMain graft.tools.ClusterProbe [sfDir]`
  *  - chain mode: synthetic path graph 0-1-2-…-N (diameter N — the
  *    worst case for label propagation; pointer jumping converges in
  *    ~log2(N) iterations). This is the regime that actually exercises
  *    the round-5 edge-list persist (the edge list is consumed once per
  *    iteration, so the persist win is linear in iteration count) and
  *    the round-6 lineage cap (per-iteration time must stay flat, not
  *    grow with plan depth). `runMain graft.tools.ClusterProbe chain N`
  *
  * Feeds the SCALE.md convergence note.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("chain") =>
        val n = args.lift(1).map(_.toLong).getOrElse(100000L)
        // A non-trivial upstream lineage (projection + filter over a
        // range) so skipping the persist forces a real recompute per
        // iteration, as the LSH pipeline would in q_dd9.
        val pairs = spark.range(n)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          .where(pmod(col("doc_a") * 2654435761L, lit(1000)) >= 0)
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val c = Dedup.dupClusters(pairs, onIter = (i, sec, changed) =>
            println(f"PROBE chain rep$rep iter=$i%2d  $sec%6.3f s  changed=$changed")
          ).where(col("cluster") === 0).count()
          println(f"PROBE chain rep$rep total ${(System.nanoTime() - t0) / 1e9}%6.3f s  inCluster0=$c  (n=$n)")
        }
      case sfArg =>
        val dir = sfArg.getOrElse("/root/testdata/sf0.1")
        for (rep <- 1 to 2) {
          val pairs = Dedup.minhashNearDups(Tables.documents(spark, dir),
            threshold = 0.5, md5Parity = true)
          val t0 = System.nanoTime()
          val n = Dedup.dupClusters(pairs, onIter = (i, sec, changed) =>
            println(f"PROBE rep$rep iter=$i%2d  $sec%6.3f s  changed=$changed")
          ).count()
          println(f"PROBE rep$rep total ${(System.nanoTime() - t0) / 1e9}%6.3f s  rows=$n  ($dir)")
        }
    }
    spark.stop()
  }
}
