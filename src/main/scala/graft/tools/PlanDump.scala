package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bloom
import graft.functions.{TextFunctions => TF}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.where(col("doc_id") % 10 === 0)
      .select(explode(TF.shingles(col("text"), 8)).as("item")).distinct()
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(TF.shingles(col("text"), 8)).as("item"))
    val bloom = Bloom.build(bench, 4, 131072)
    val df = Bloom.filterMembersPacked(corpus, "item", bloom, 4, 131072)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    scala.Console.out.println("md5_sites=" + "md5".r.findAllIn(p).size)
    scala.Console.out.println(p.take(2500))
    spark.stop()
  }
}
