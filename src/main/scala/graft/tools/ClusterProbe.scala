package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables

/** Diagnostic main for [[graft.operators.Dedup.dupClusters]] — the
  * q_dd9 fixpoint: runs the exact q_dd9 pair pipeline (MinHash-LSH over
  * documents, md5 parity) at the given SF and prints per-iteration
  * wall time + changed-label counts, then total wall time. Feeds the
  * SCALE.md convergence note (iteration count, per-iteration flatness
  * with the round-6 lineage cap in place).
  *
  * Usage: runMain graft.tools.ClusterProbe [sfDir]
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 2) {
      val pairs = Dedup.minhashNearDups(Tables.documents(spark, dir),
        threshold = 0.5, md5Parity = true)
      val t0 = System.nanoTime()
      val n = Dedup.dupClusters(pairs, onIter = (i, sec, changed) =>
        println(f"PROBE rep$rep iter=$i%2d  $sec%6.3f s  changed=$changed")
      ).count()
      println(f"PROBE rep$rep total ${(System.nanoTime() - t0) / 1e9}%6.3f s  rows=$n  ($dir)")
    }
    spark.stop()
  }
}
