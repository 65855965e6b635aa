package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import graft.sources.Tables

/** Measurement harness for the IVF quantizer choice: per-quantizer cell
  * balance, probed-corpus fraction, and recall@10 — the evidence behind
  * SCALE.md's quantizer table. Run: `runMain graft.tools.IvfProbe [sfDir]`.
  *
  * This is a DIAGNOSTIC main, not an operator: it collects bounded
  * result sets (top-k id pairs, 16 cell counts) to the driver to compute
  * recall — the engine's operators themselves never collect.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val embs = Tables.embeddings(spark, dir).cache()
    val n = embs.count()
    // Queries DISJOINT from both seed sets: under the first-N quantizer
    // the vec_id<5 oracle queries ARE centroids (cos(q, c_q) = 1 gives
    // each query a dedicated cell of exactly its neighbors) — recall
    // measured on them is leakage, not quantizer quality.
    val q = embs.where(col("vec_id") >= 100 && col("vec_id") < 120)
    val exact = Similarity.bruteForceTopK(q, embs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def centroidStats(name: String, cents: DataFrame, nProbe: Int): Unit = {
      val c = broadcast(cents.select(col("cid"), col("ce"), VF.l2Norm(col("ce")).as("cn")))
      def assign(df: DataFrame, keep: Int) = {
        val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
        df.select(col("vec_id"), col("embedding"), VF.l2Norm(col("embedding")).as("nrm"))
          .where(col("nrm") > 0).crossJoin(c)
          .withColumn("ccos",
            round(VF.dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6))
          .withColumn("crank", row_number().over(w)).where(col("crank") <= keep)
          .select(col("vec_id"), col("cid"))
      }
      val cells = assign(embs, 1).groupBy("cid").count()
      val sizes = cells.collect().map(_.getLong(1)).sorted
      val probed = assign(q, nProbe)
        .join(cells, "cid").groupBy("vec_id").agg(sum("count").as("cand"))
        .agg(avg("cand")).head().getDouble(0)
      scala.Console.out.println(
        f"$name%-22s cells=${sizes.length}%2d min=${sizes.head}%4d " +
        f"med=${sizes(sizes.length / 2)}%4d max=${sizes.last}%4d " +
        f"probedFrac=${probed / n}%.3f")
    }

    def recall(name: String, res: DataFrame): Unit = {
      val approx = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      scala.Console.out.println(
        f"$name%-22s recall@10=${(exact intersect approx).size.toDouble / exact.size}%.3f")
    }

    val firstN = embs.orderBy("vec_id").limit(16)
      .select(col("vec_id").cast("long").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("ce"))
    centroidStats("first-N", firstN, 4)

    // recall with explicit centroids (the pre-k-means first-N path)
    def ivfWith(cents: DataFrame, nProbe: Int): DataFrame = {
      val c = broadcast(cents.select(col("cid"), col("ce"), VF.l2Norm(col("ce")).as("cn")))
      def assign(df: DataFrame, idCol: String, keep: Int) = {
        val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
        df.select(col("vec_id").as(idCol), col("embedding"),
            VF.l2Norm(col("embedding")).as("nrm"))
          .where(col("nrm") > 0).crossJoin(c)
          .withColumn("ccos",
            round(VF.dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6))
          .withColumn("crank", row_number().over(w)).where(col("crank") <= keep)
          .select(col(idCol), col("embedding"), col("nrm"), col("cid"))
      }
      val cc = assign(embs, "neighbor_id", 1)
        .withColumnRenamed("embedding", "ne").withColumnRenamed("nrm", "nn")
      val qc = assign(q, "query_id", nProbe)
        .withColumnRenamed("embedding", "qe").withColumnRenamed("nrm", "qn")
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      cc.join(broadcast(qc), Seq("cid"))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", round(VF.dot(col("qe"), col("ne")) / (col("qn") * col("nn")), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select("query_id", "neighbor_id")
    }
    recall("first-N nProbe=4", ivfWith(firstN, 4))
    for (iters <- Seq(0, 1, 2, 3))
      centroidStats(s"kmeans-$iters",
        Similarity.trainCentroids(embs, 16, iters, trainN = 1024), 4)
    for (iters <- Seq(0, 1, 2, 3))
      recall(s"kmeans-$iters nProbe=4",
        Similarity.ivfTopK(q, embs, 10, lloydIters = iters,
          nProbe = 4, trainN = 1024))
    for (np <- Seq(6, 8))
      recall(s"kmeans-2 nProbe=$np",
        Similarity.ivfTopK(q, embs, 10, nProbe = np, trainN = 1024))

    // Round-4 section: shipped defaults (nProbe=8, trainN=4096) and the
    // int8 index at matched parameters — the float-vs-int8 recall deltas
    // behind SCALE.md's int8 table and the documented-defaults test.
    recall("float defaults np=8", Similarity.ivfTopK(q, embs, 10))
    recall("int8 defaults np=8", Similarity.ivfTopKInt8(q, embs, 10))
    recall("float np=4 tr=1024",
      Similarity.ivfTopK(q, embs, 10, nProbe = 4, trainN = 1024))
    recall("int8 np=4 tr=1024 (q_sim5 params)",
      Similarity.ivfTopKInt8(q, embs, 10, nProbe = 4, trainN = 1024))
    for (rd <- Seq(10, 30, 60))
      recall(s"int8 np=8 rerank=$rd",
        Similarity.ivfTopKInt8(q, embs, 10, rerankDepth = rd))
    // LSH with and without flip-1 multi-probe (round 4): corpus-side
    // cost identical, query probes (planes+1)× buckets.
    recall("lsh p=6/t=8", Similarity.lshTopK(q, embs, 10))
    recall("lsh p=6/t=8 flip1", Similarity.lshTopK(q, embs, 10, flip1 = true))
    recall("lsh p=9/t=8 flip1", Similarity.lshTopK(q, embs, 10, planes = 9, flip1 = true))
    for ((label, p, f) <- Seq(("p=6 exact", 6, false), ("p=6 flip1", 6, true),
        ("p=9 flip1", 9, true)))
      scala.Console.out.println(f"lsh cand $label%-12s " +
        f"${Similarity.lshCandidates(q, embs, planes = p, flip1 = f).count()}%6d " +
        f"of ${20 * n}%d q-pairs")
    val kAuto = Similarity.autoCentroids(n)
    for (np <- Seq(8, 12, 16, 22))
      recall(f"auto k=$kAuto np=$np",
        Similarity.ivfTopK(q, embs, 10, nCentroids = kAuto, nProbe = np))
    spark.stop()
  }
}
