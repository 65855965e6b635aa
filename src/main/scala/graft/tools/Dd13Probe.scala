package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-21 diagnostic for the q_dd13 prefix self-join (VERDICT #4):
  * executes the query and prints the FINAL (post-AQE) plan, where
  * exchange reuse shows up as ReusedExchange / table-cache reuse —
  * the pre-execution `explain` only shows the initial plan. Also
  * times the query standalone.
  * Usage: runMain graft.tools.Dd13Probe [sfDir]
  */
object Dd13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dd13_prefix_jaccard")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    scala.Console.out.println(
      f"PROBE q_dd13 min=${ts.min}%6.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    val df = graft.SparkEntry.queries("q_dd13_prefix_jaccard")(spark, sfDir)
    // collect() executes THIS frame's own query execution, so the
    // printed executedPlan is the post-AQE final plan (a count() wraps
    // a separate execution and would print the un-executed initial).
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    scala.Console.out.println("reused_exchange=" +
      "ReusedExchange".r.findAllIn(p).size +
      " reused_stage=" + "ReusedQueryStage".r.findAllIn(p).size +
      " smj=" + "SortMergeJoin".r.findAllIn(p).size +
      " bhj=" + "BroadcastHashJoin".r.findAllIn(p).size)
    scala.Console.out.println(p.take(4000))
    spark.stop()
  }
}
