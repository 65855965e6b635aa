package graft.tools
import org.apache.spark.sql.SparkSession
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.sources.Tables

/** Candidate-volume measurement for SimHash blocking (SCALE.md evidence):
  * distinct candidate pairs with and without `blockBy = lang` on the real
  * documents table. Run: `runMain graft.tools.SimhashBlockProbe [sfDir]`.
  */
object SimhashBlockProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).cache()
    val n = docs.count()
    for (block <- Seq(Nil, Seq("lang"))) {
      val t0 = System.nanoTime()
      val c = Dedup.simhashCandidates(docs, maxHamming = 3,
        md5Parity = true, bits = 60, blockBy = block).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val label = if (block.isEmpty) "unblocked" else block.mkString("+")
      scala.Console.out.println(f"PROBE docs=$n $label%-10s candidates=$c%8d  $secs%.2f s")
    }
    spark.stop()
  }
}
