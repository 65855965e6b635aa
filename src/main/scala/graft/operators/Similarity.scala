package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Similarity search over embedding columns (SURVEY.md §2.6 SIM-1 and the
  * ANN scale path).
  *
  * Two tiers, per the 100 TB stance:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; O(|corpus|·|queries|) with no corpus
  *    shuffle. The baseline and the oracle-checkable path.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus is bucketed by sign
  *    signatures (map-side), queries probe matching buckets across L
  *    independent tables, candidates are re-ranked exactly. Cost follows
  *    bucket collisions, not corpus size × query count; at 1000 executors
  *    the bucket join is an ordinary hash-shuffle join on (table, bucket).
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    * `queries`/`corpus` must both have (`vec_id`, `embedding`); self-pairs
    * are excluded. The query side is broadcast — the corpus never
    * shuffles for the join; the only exchange is the per-query top-k
    * (k·|queries| rows).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(VF.cosine(col("qe"), col("ne")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane weight in [-1, 1] for
    * (table, plane, dim) — derived from xxhash64 so every executor
    * materializes identical planes with zero driver-side state.
    */
  private def planeWeight(table: Int, plane: Int, dimIdx: org.apache.spark.sql.Column) = {
    val h = xxhash64(lit(table * 1009 + plane), dimIdx)
    (pmod(h, lit(2000003L)).cast("double") - 1000001.0) / 1000001.0
  }

  /** Sign-bucket signature for one LSH table: `planes` hyperplane sign
    * bits packed into a long. Map-side only.
    */
  private def bucketFor(table: Int, planes: Int, emb: org.apache.spark.sql.Column) =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast("double") * planeWeight(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: L independent random-hyperplane tables; a
    * candidate is any corpus vector sharing a bucket with the query in at
    * least one table; candidates are re-ranked by exact cosine. Recall
    * rises with L and falls with `planes` (bucket granularity).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idCol: String) = {
      val buckets = array((0 until tables).map(t =>
        bucketFor(t, planes, col("embedding"))): _*)
      df.select(col("vec_id").as(idCol), col("embedding"),
        posexplode(buckets).as(Seq("table", "bucket")))
    }
    val qb = bucketed(queries, "query_id").withColumnRenamed("embedding", "qe")
    val cb = bucketed(corpus, "neighbor_id").withColumnRenamed("embedding", "ne")
    val candidates = cb.join(broadcast(qb), Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qe", "ne")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("cos", round(VF.cosine(col("qe"), col("ne")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
