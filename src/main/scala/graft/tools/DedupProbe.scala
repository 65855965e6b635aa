package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.sources.Tables
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }.minBy(_._1) match { case (t, n) => println(f"PROBE $name%-28s $t%.3f s  rows=$n") }
    }
    val docs = Tables.documents(spark, dir)
    time("xxhash-variant") {
      Dedup.minhashNearDups(docs, threshold = 0.5).count()
    }
    time("md5-variant") {
      Dedup.minhashNearDups(docs, threshold = 0.5, md5Parity = true).count()
    }
    // stage pieces with md5 hasher
    time("explode-shingles-only") {
      docs.select(col("doc_id"), explode(TF.shingles(col("text"), 3)).as("s")).count()
    }
    time("explode+md5hash") {
      docs.select(col("doc_id"), explode(TF.shingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), pmod(TF.hexHash60(col("s")), lit(TF.MinhashPrime)).as("h"))
        .agg(sum("h")).count()
    }
    time("explode+xxhash") {
      docs.select(col("doc_id"), explode(TF.shingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), pmod(xxhash64(col("s")), lit(TF.MinhashPrime)).as("h"))
        .agg(sum("h")).count()
    }
    spark.stop()
  }
}
