package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import graft.sources.Tables

/** One-decade-beyond-sf0.1 scaling probe for the SIM family — the
  * counterpart of [[ScalingProbe]] (which covers the dedup family), per
  * VERDICT r3 #7: LSH (q_sim2) candidate volume, IVF (q_sim3) training
  * wall-time and cell-size balance at 5k (real sf0.1), a 5k synthetic
  * CONTROL, and 50k (sf1-equivalent) vectors.
  *
  * The synthetic corpus replays the real embeddings' measured character —
  * 64-dim, isotropic directions, no label cluster structure (the real
  * intra/inter-label cosine is 0.0016 vs 0.0003 — indistinguishable) —
  * deterministically: component d of vector i is xxhash64(i, d)-derived
  * uniform in [-0.5, 0.5] (cosine is scale-invariant, so skipping the
  * unit-normalization of the real data changes nothing downstream). The
  * 5k control validates extrapolation: if its candidate counts and cell
  * balance track the real 5k corpus, the 50k point is a trustworthy
  * next decade. Run: `runMain graft.tools.SimScalingProbe`.
  *
  * Diagnostic main, not an operator: collects bounded aggregates (cell
  * counts, candidate counts) — operators themselves never collect.
  */
object SimScalingProbe {
  def synthVecs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        ((pmod(xxhash64(lit("vec"), col("id"), d), lit(1000001)).cast("double")
          / 1000000.0 - 0.5)).cast("float")).as("embedding"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
    }
    val corpora = Seq(
      "real-5k" -> Tables.embeddings(spark, "/root/testdata/sf0.1")
        .select("vec_id", "embedding"),
      "synth-5k" -> synthVecs(spark, 5000),
      "synth-50k" -> synthVecs(spark, 50000))
    for ((name, raw) <- corpora) {
      val corpus = raw.cache()
      val n = corpus.count()
      val q = corpus.where(col("vec_id") >= 100 && col("vec_id") < 120)

      // q_sim2 stage: LSH bucket-collision candidates at the shipped
      // planes=6 and at planes=9 — the "planes grow ~log2(n)" scale rule
      // measured rather than asserted (each extra plane should halve the
      // per-table collision fraction on isotropic data).
      val lsh = Seq(6, 9).map { p =>
        val (c, t) = timed(Similarity.lshCandidates(q, corpus, planes = p).count())
        (p, c, t)
      }

      // q_sim3 stage: training wall-time (trainCentroids materializes
      // internally, so this times exactly one full training) and the
      // cell-size histogram of the resulting index, at the oracle shape
      // (k=16) and the √n scale rule.
      for (k <- Seq(16, Similarity.autoCentroids(n))) {
        val (cents, trainT) = timed(
          Similarity.trainCentroids(corpus, nCentroids = k))
        val c = broadcast(cents.select(col("cid"), col("ce"),
          VF.l2Norm(col("ce")).as("cn")))
        val sizes = corpus
          .select(col("vec_id"), col("embedding"), VF.l2Norm(col("embedding")).as("nrm"))
          .where(col("nrm") > 0).crossJoin(c)
          .withColumn("ccos",
            round(VF.dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6))
          .groupBy("vec_id")
          .agg(max(struct(col("ccos"), (-col("cid")).as("negcid"))).as("m"))
          .groupBy((-col("m.negcid")).as("cid")).count()
          .collect().map(_.getLong(1)).sorted
        scala.Console.out.println(
          f"PROBE $name%-9s n=$n%6d k=$k%3d trainSec=$trainT%6.2f " +
          f"cells=${sizes.length}%3d min=${sizes.head}%5d med=${sizes(sizes.length / 2)}%5d " +
          f"max=${sizes.last}%5d")
      }
      for ((p, c, t) <- lsh)
        scala.Console.out.println(
          f"PROBE $name%-9s n=$n%6d planes=$p lshCandidates=$c%8d " +
          f"frac=${c.toDouble / 20 / n}%.4f ($t%5.2f s, 20 queries)")
      corpus.unpersist()
    }
    spark.stop()
  }
}
