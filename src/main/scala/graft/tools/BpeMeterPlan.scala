package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-21 plan evidence for the q_ml18 meter rewrite: the token
  * meter sits behind Packing's localCheckpoint, so the QUERY plan dump
  * cannot show it — this prints the meter projection's own plan in
  * both forms (the interpreted higher-order-function fold vs the
  * native bpe_token_count expression).
  * Usage: runMain graft.tools.BpeMeterPlan
  */
object BpeMeterPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = graft.operators.Bpe.learnMerges(docs, nMerges = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    println("========== meter_fold (before) ==========")
    docs.select(col("doc_id"),
        graft.operators.Bpe.textCountFold(merges)(col("text")).as("n"))
      .explain("formatted")
    println("========== meter_native (after) ==========")
    docs.select(col("doc_id"),
        graft.operators.Bpe.textCount(merges)(col("text")).as("n"))
      .explain("formatted")
    spark.stop()
  }
}
