package graft.operators

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot/l2 on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val row = df.select(
      VF.dot(col("a"), col("b")).as("d"),
      VF.cosine(col("a"), col("a")).as("self"),
      VF.l2Norm(col("c")).as("n"),
      VF.l2Distance(col("a"), col("b")).as("dist")).head()
    assert(row.getDouble(0) == 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) == 5.0)
    assert(math.abs(row.getDouble(3) - math.sqrt(2)) < 1e-12)
  }

  // 3 well-separated clusters of 5 vectors each + a query near cluster 0.
  private def clustered = {
    val centers = Seq(
      Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f),
      Array(-1f, 1f, -1f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 1f, -1f, 1f, -1f))
    val corpus = for {
      (cen, ci) <- centers.zipWithIndex
      j <- 0 until 5
    } yield {
      val v = cen.zipWithIndex.map { case (x, d) => x + 0.01f * ((ci * 5 + j + d) % 7) }
      ((ci * 5 + j).toLong, v.toSeq)
    }
    corpus.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks own-cluster vectors first") {
    val q = clustered.where(col("vec_id") === 0)
    val res = Similarity.bruteForceTopK(q, clustered, k = 4)
      .collect().map(r => r.getLong(1))
    // neighbors 1..4 are the rest of cluster 0
    assert(res.toSet == Set(1L, 2L, 3L, 4L))
  }

  test("ivfTopK: probing enough cells recovers the own-cluster neighbors") {
    // Interleave clusters so the first-N quantizer seeds are one per
    // cluster (id % 3 = cluster): a degenerate all-one-cluster seed set
    // fragments that cluster into singleton cells by construction.
    val centers = Seq(
      Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f),
      Array(-1f, 1f, -1f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 1f, -1f, 1f, -1f))
    val corpus = (0 until 15).map { id =>
      val cen = centers(id % 3)
      val v = cen.zipWithIndex.map { case (x, d) => x + 0.01f * ((id + d) % 7) }
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(q, corpus, k = 4)
      .collect().map(_.getLong(1)).toSet
    val approx = Similarity.ivfTopK(q, corpus, k = 4, nCentroids = 3, nProbe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(exact == Set(3L, 6L, 9L, 12L), s"brute force finds the own cluster: $exact")
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.75, s"recall $recall too low: exact=$exact approx=$approx")
  }

  test("lshTopK recall: finds the brute-force top-4 for a clustered query") {
    val q = clustered.where(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, k = 4)
      .collect().map(_.getLong(1)).toSet
    val approx = Similarity.lshTopK(q, clustered, k = 4, planes = 4, tables = 4)
      .collect().map(_.getLong(1)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.75, s"recall $recall too low: exact=$exact approx=$approx")
  }

  test("lshTopK fails loudly when a vector exceeds the plan-time dim") {
    val q = clustered.where(col("vec_id") === 0)
    val ex = intercept[Exception] {
      Similarity.lshTopK(q, clustered, k = 4, planes = 4, tables = 4, dim = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("embedding dim exceeds")), ex.getMessage)
  }
}
