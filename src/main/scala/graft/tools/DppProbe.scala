package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Measured law for DYNAMIC partition pruning — the scan feature that
  * makes "fact partitioned by date, dim filtered by attribute" cheap
  * at 100 TB: the dim filter's surviving partition keys are computed
  * at runtime and pushed into the fact scan's partition filter, so
  * the fact reads only the matching directories even though the
  * pruning predicate is not a literal in the query. Static pruning
  * (a literal on the partition column) and z-order (row-group skips
  * INSIDE files, LayoutProbe) are already measured; this closes the
  * partition-directory level.
  *
  * Shape: lineitem (sf0.1) written hive-partitioned by a 16-way key,
  * joined to a 2-row dim that survives a selective filter. Three
  * runs: DPP ON, DPP OFF (runtime pruning disabled), and STATIC (the
  * two keys as literals — the floor DPP should approach). Reported
  * per run: fact files/rows actually read (scan-node metrics off the
  * collect()-finalized adaptive plan) and wall seconds (min of 2).
  *
  * Diagnostic main, not an operator (tools/ contract).
  * Run: `runMain graft.tools.DppProbe`.
  */
object DppProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // AQE off for METRIC VISIBILITY only (DPP predates AQE and works
      // either way): adaptive plans hide scans inside query stages
      // whose metrics a plain tree-collect can't reach.
      .config("spark.sql.adaptive.enabled", false)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString

    // Fact: lineitem hive-partitioned 16 ways on a derived key.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("pt", pmod(col("l_partkey"), lit(16)).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(s"$base/fact")
    // Dim: 16 rows, 2 survive the attribute filter.
    spark.range(16).select(col("id").cast("int").as("pt"),
        (col("id") % 8).as("attr"))
      .write.mode("overwrite").parquet(s"$base/dim")

    def scanMetrics(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
          : org.apache.spark.sql.execution.SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      // The fact scan is the one whose partition schema carries `pt`.
      val scans = finalPlan(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec
            if s.relation.partitionSchema.fieldNames.contains("pt") => s
      }
      val files = scans.map(_.metrics("numFiles").value).sum
      val rows = scans.map(_.metrics("numOutputRows").value).sum
      (files, rows, secs)
    }

    def q(dppOn: Boolean) = {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", dppOn)
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").where(col("attr") === 3)
      fact.join(dim, "pt").agg(sum("l_quantity"))
    }
    def qStatic = {
      val fact = spark.read.parquet(s"$base/fact")
        .where(col("pt") === 3 || col("pt") === 11)
      fact.agg(sum("l_quantity"))
    }

    println("| mode | fact files read | fact rows read | s |")
    println("|---|---|---|---|")
    for ((label, mk) <- Seq(
        ("dpp off", () => q(dppOn = false)),
        ("dpp on", () => q(dppOn = true)),
        ("static literals", () => qStatic))) {
      val runs = Seq.fill(2)(scanMetrics(mk()))
      val (f, r, _) = runs.head
      val s = runs.map(_._3).min
      println(f"| $label | $f | $r | $s%.2f |")
    }
    spark.stop()
  }
}
