package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core-count scaling probe (round 21, VERDICT #2): the driver's
  * 8-vs-32-core bench comparison at sf0.1 reads ≈1.0 because per-query
  * times sit on the fixed per-job/stage latency floor (the board's own
  * `floor` accounting) — nothing at that SF is big enough to expose the
  * core ratio, which made `suspect_cpus_ignored` fire even though
  * Bench.scala honors $SPARK_GRAFT_CPUS. This probe runs the same
  * OPERATOR SHAPES the query board is made of (scan→partial-agg→
  * exchange, shuffle join, keyed window, global sort, plus the pure-CPU
  * calib kernel) on synthetic inputs sized ~50-100× the sf0.1 work, one
  * fresh local[N] session per core count, so the ratio is visible and
  * attributable. Output: a markdown table for SCALE.md.
  *
  * Usage: `runMain graft.tools.CoreScalingProbe [rows] [cores...]`
  * (defaults 200M rows, cores 8 and 32). Diagnostic main, not an
  * operator; results are environment evidence, never cached.
  */
object CoreScalingProbe {
  def main(args: Array[String]): Unit = {
    // 50M keeps every leg inside the sbt-launched driver's 4 GiB heap
    // (200M drove the shuffle join + global sort into GCLocker retry
    // stalls) while still ~50× the sf0.1 per-query work — ample for the
    // core ratio to show.
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val coreList = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(8, 32)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Double]]
    for (cores <- coreList) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .appName(s"core-scaling-$cores").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def timed(tag: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        results.getOrElseUpdate(tag,
          scala.collection.mutable.LinkedHashMap.empty) += (cores -> ts.min)
      }
      val base = spark.range(0L, n, 1L, cores)
      timed("cpu_xxhash") {
        base.selectExpr("xxhash64(id) AS h").selectExpr("bit_xor(h)").collect()
      }
      timed("agg_20m_groups") {
        noop(base.groupBy(pmod(xxhash64(col("id")), lit(n / 10)).as("k"))
          .agg(count(lit(1)).as("c"), sum(col("id")).as("s")))
      }
      timed("shuffle_join") {
        val a = spark.range(0L, n / 2, 1L, cores)
          .select(pmod(xxhash64(col("id")), lit(n / 20)).as("k"),
            col("id").as("va"))
        val b = spark.range(0L, n / 2, 1L, cores)
          .select(pmod(xxhash64(col("id"), lit(7)), lit(n / 20)).as("k"),
            col("id").as("vb"))
        noop(a.join(b, "k").select(sum(col("va") + col("vb"))))
      }
      timed("keyed_window_rank") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("k").orderBy(col("v").desc)
        noop(base.select(pmod(xxhash64(col("id")), lit(n / 100)).as("k"),
            xxhash64(col("id"), lit(3)).as("v"))
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 2))
      }
      timed("global_sort") {
        noop(base.select(xxhash64(col("id")).as("h")).orderBy("h"))
      }
      spark.stop()
    }
    val cols = coreList.map(c => s"local[$c] s").mkString(" | ")
    scala.Console.out.println(s"| leg (rows=$n) | $cols | ratio |")
    scala.Console.out.println("|---|" + coreList.map(_ => "---|").mkString + "---|")
    for ((tag, byCores) <- results) {
      val ts = coreList.map(byCores(_))
      val ratio = ts.head / ts.last
      scala.Console.out.println(
        s"| $tag | ${ts.map(t => f"$t%.1f").mkString(" | ")} | ${f"$ratio%.2f"}× |")
    }
  }
}
