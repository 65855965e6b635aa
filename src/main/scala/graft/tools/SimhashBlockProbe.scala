package graft.tools
import org.apache.spark.sql.SparkSession
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.sources.Tables

/** Candidate-volume measurement for SimHash blocking (SCALE.md evidence):
  * distinct candidate pairs unblocked, `blockBy = lang`, and the
  * MULTI-KEY composition lang × length-bucket — SCALE.md predicts
  * blocking constants MULTIPLY (each key divides by the sum of squared
  * block shares); this probe measures the product directly. The length
  * bucket is a derived column (token count div 25 — ~4 buckets over the
  * generator's U[10,100] lengths); blockBy takes any column name, so
  * composing a derived key is one `withColumn`. Run:
  * `runMain graft.tools.SimhashBlockProbe [sfDir]`.
  */
object SimhashBlockProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
      .withColumn("len_bucket", (size(TF.tokens(col("text"))) / 25).cast("int"))
      .cache()
    val n = docs.count()
    // Predicted divisor of each key = 1 / Σ share², printed next to the
    // measured reduction so the multiply-the-constants claim is checked.
    for (key <- Seq("lang", "len_bucket")) {
      val shares = docs.groupBy(key).count().collect()
        .map(_.getLong(1).toDouble / n)
      scala.Console.out.println(
        f"PROBE key=$key%-10s blocks=${shares.length}%2d predictedDiv=${1.0 / shares.map(s => s * s).sum}%.2f")
    }
    var unblocked = 0L
    for (block <- Seq(Nil, Seq("lang"), Seq("len_bucket"), Seq("lang", "len_bucket"))) {
      val t0 = System.nanoTime()
      val c = Dedup.simhashCandidates(docs, maxHamming = 3,
        md5Parity = true, bits = 60, blockBy = block).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val label = if (block.isEmpty) { unblocked = c; "unblocked" } else block.mkString("+")
      scala.Console.out.println(
        f"PROBE docs=$n $label%-16s candidates=$c%8d  div=${unblocked.toDouble / c}%.2f  $secs%.2f s")
    }
    spark.stop()
  }
}
