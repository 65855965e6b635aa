package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Round-21 diagnostic for the q_sim12 ADC rewrite (VERDICT r20 #1):
  * times each leg of adcRecallAudit separately with the noop sink
  * (guide §1.4) and prints the scoring leg's formatted plan, so the
  * LUT-join → array-lookup claim is measured at the leg level instead
  * of inferred from the end-to-end board number.
  * Usage: runMain graft.tools.AdcProbe [sfDir]
  */
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      scala.Console.out.println(
        f"PROBE $tag%-28s min=${ts.min}%6.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.where(col("vec_id") % 10 === 7)
    val cb = Similarity.trainPqCodebooks(embs, m = 4, ksub = 16, iters = 2,
      trainN = 1024, dim = 64)
    val codes = Similarity.pqCodes(embs, cb, m = 4, dim = 64)
      .select("vec_id", "sub", "code")
    // warm the artifacts/memos once, untimed
    noop(Similarity.pqAdcTopK(queries, codes, cb, k = 30, m = 4, dim = 64))
    Similarity.cachedTruth(queries, embs, k = 10).count()

    timed("adc_topk_noop") {
      noop(Similarity.pqAdcTopK(queries, codes, cb, k = 30, m = 4, dim = 64))
    }
    timed("adc_topk_checkpoint") {
      val df = Similarity.pqAdcTopK(queries, codes, cb, k = 30, m = 4, dim = 64)
        .select("query_id", "neighbor_id", "rank").localCheckpoint()
      graft.util.ScratchCheckpoints.register(df)
      graft.util.ScratchCheckpoints.drain()
    }
    timed("truth_read") {
      noop(Similarity.cachedTruth(queries, embs, k = 10))
    }
    timed("full_query_count") {
      graft.analytics.ExtensionQueries.adcRecallAudit(spark, sfDir).count()
      graft.util.ScratchCheckpoints.drain()
    }
    scala.Console.out.println("===== adc leg plan =====")
    Similarity.pqAdcTopK(queries, codes, cb, k = 30, m = 4, dim = 64)
      .explain("formatted")
    spark.stop()
  }
}
