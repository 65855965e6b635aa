package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.sources.Tables

/** Timing probe for the IVF training composition: trainCentroids alone
  * vs the full operator at several iteration/sample settings — the
  * evidence that caught the persisted-centroid reuse failure (an Array
  * param in HyperplaneBuckets broke plan equality, so every consumer
  * re-ran training; see the Seq note in SignatureExpressions).
  * Run: `runMain graft.tools.TrainProbe`.
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      scala.Console.out.println(f"PROBE $name%-22s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("trainCentroids.count") {
      Similarity.trainCentroids(embs, 16, 2).count()
    }
    time("ivfTopK.count") {
      Similarity.ivfTopK(embs.where(org.apache.spark.sql.functions.col("vec_id") < 5),
        embs, 10).count()
    }
    time("ivfTopK iters=0") {
      Similarity.ivfTopK(embs.where(org.apache.spark.sql.functions.col("vec_id") < 5),
        embs, 10, lloydIters = 0).count()
    }
    time("ivfTopK trainN=256") {
      Similarity.ivfTopK(embs.where(org.apache.spark.sql.functions.col("vec_id") < 5),
        embs, 10, trainN = 256).count()
    }
    spark.stop()
  }
}
