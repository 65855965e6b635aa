package graft.tools

import graft.SparkEntry

/** Dev tool: print the formatted physical plan for one query (or all).
  * Usage: runMain graft.tools.Explain <sfDir> [queryName ...]
  * Used to audit broadcast/pushdown/codegen per SURVEY.md §4 before bench.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Engine session (AQE on) — audited plans must be the plans the
    // engine actually runs.
    val spark = graft.Engine.localSession(4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
