package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}
import graft.sources.Tables

/** Dev tool: A/B the q_adv7 PageRank plan shapes and audit exchange
  * reuse, per the round-6 verdict's ask (reconcile SCALE.md's 3.3 s
  * claim vs the driver's 5.7-6.2 s and prove which form is optimal).
  *
  * Usage: runMain graft.tools.GraphProbe [sfDir] [reps]
  *
  * Measures, at the bench session settings (AQE on, local[4], shuffle
  * partitions 4):
  *   A. lazy      — the shipped single-plan pageRank over the MinHash
  *                  pair pipeline (edge subtrees deduped by
  *                  ReusedExchange within the one plan);
  *   B. ckpt      — pair graph materialized once via eager
  *                  localCheckpoint, then the same 5 unrolled rounds
  *                  over the tiny checkpointed edge list;
  *   C. weighted  — the q_adv7b lazy form, for the family baseline;
  *   D. until     — pageRankUntil at eps=1e-9 on the same graph
  *                  (iteration count + wall time to fixpoint).
  * Also counts ReusedExchange nodes in A's EXECUTED plan (AQE final)
  * and prints the per-round convergence trace of D.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.Engine.localSession(4, "graft-graph-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def pairs: DataFrame = Dedup.minhashNearDups(Tables.documents(spark, sfDir),
      threshold = 0.5, md5Parity = true)
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-10s min ${ts.min}%.2f s  med ${ts.sorted.apply(ts.size / 2)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("lazy") {
      Graph.pageRank(pairs)
        .select(col("node"), col("rank").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(25)
    }
    time("ckpt") {
      val p = pairs.localCheckpoint(eager = true)
      try Graph.pageRank(p)
        .select(col("node"), col("rank").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(25)
      finally ()
    }
    time("weighted") {
      Graph.pageRank(pairs, weightCol = Some("jaccard"))
        .select(col("node"), col("rank").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(25)
    }
    // Convergence mode: iterations to eps fixpoint + per-round deltas.
    val t0 = System.nanoTime()
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    Graph.pageRankUntil(pairs, eps = 1e-9,
      onIter = (i, d) => trace += ((i, d))).count()
    println(f"until      ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
      s"iters=${trace.size}  deltas=${trace.map { case (_, d) => f"$d%.2e" }.mkString(",")}")

    // Exchange-reuse audit of the shipped lazy plan, post-execution
    // (AQE finalizes reuse decisions at runtime).
    val q = Graph.pageRank(pairs)
      .select(col("node"), col("rank").as("pr"))
      .orderBy(col("pr").desc, col("node")).limit(25)
    q.count()
    val executed = q.queryExecution.executedPlan
    def countNodes(p: org.apache.spark.sql.execution.SparkPlan,
        pred: String => Boolean): Int = {
      var n = 0
      def walk(x: org.apache.spark.sql.execution.SparkPlan): Unit = {
        if (pred(x.nodeName)) n += 1
        x.children.foreach(walk)
        x.subqueries.foreach(walk)
        x match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(s.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            () // reuse target already counted where it lives
          case _ => ()
        }
      }
      walk(executed)
      n
    }
    val reused = countNodes(executed, _.contains("ReusedExchange"))
    val shuffles = countNodes(executed, n =>
      n.contains("Exchange") && !n.contains("Reused"))
    println(s"executed plan: $shuffles exchanges, $reused reused")
    spark.stop()
  }
}
