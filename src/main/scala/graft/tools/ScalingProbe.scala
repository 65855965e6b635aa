package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** One-decade-beyond-sf0.1 scaling probe for the near-dup family
  * (SCALE.md evidence): candidate volume and end-to-end time for
  * MinHash-LSH and SimHash (±lang blocking) at 5k (real sf0.1), a
  * 5k SYNTHETIC control, and 50k (sf1-equivalent) documents.
  *
  * The synthetic corpus replays the measured character of the driver's
  * generator — 31-token uniform vocabulary, doc length uniform 10..100,
  * lang ≈ {en 0.43, 4 others 0.14} — deterministically (xxhash64-keyed,
  * no RNG state). The 5k control validates the extrapolation: if its
  * candidate counts track the real 5k corpus, the 50k point is a
  * trustworthy next decade. Run: `runMain graft.tools.ScalingProbe`.
  *
  * Diagnostic main, not an operator: the one `.collect()` pulls the
  * 31-token vocabulary to build generator literals — the operators
  * themselves never collect.
  */
object ScalingProbe {
  def synthDocs(spark: SparkSession, n: Long, vocab: Seq[String]): DataFrame = {
    val langs = Seq("en", "en", "en", "zh", "es", "fr", "de")
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(0), (pmod(xxhash64(col("id")), lit(91)) + 9).cast("int")),
        j => element_at(typedLit(vocab),
          (pmod(xxhash64(col("id"), j), lit(vocab.length)) + 1).cast("int"))))
        .as("text"),
      element_at(typedLit(langs),
        (pmod(xxhash64(lit("lang"), col("id")), lit(langs.length)) + 1).cast("int"))
        .as("lang"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val real = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang")
    val vocab = real.select(explode(split(col("text"), " ")).as("t"))
      .distinct().orderBy("t").collect().map(_.getString(0)).toSeq
    val corpora = Seq(
      "real-5k" -> real,
      "synth-5k" -> synthDocs(spark, 5000, vocab),
      "synth-50k" -> synthDocs(spark, 50000, vocab))
    for ((name, docsRaw) <- corpora) {
      val docs = docsRaw.cache(); docs.count()
      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
      }
      val (mc, mct) = timed(Dedup.minhashCandidates(docs).count())
      val (mp, mpt) = timed(Dedup.minhashNearDups(docs, threshold = 0.5).count())
      val (sc, sct) = timed(Dedup.simhashCandidates(docs).count())
      val (sb, sbt) = timed(Dedup.simhashCandidates(docs, blockBy = Seq("lang")).count())
      scala.Console.out.println(
        f"PROBE $name%-10s dd5 cand=$mc%9d (${mct}%5.1f s) pairs=$mp%7d (${mpt}%5.1f s)  " +
        f"dd6 cand=$sc%9d (${sct}%5.1f s) blocked=$sb%9d (${sbt}%5.1f s)")
      docs.unpersist()
    }
    spark.stop()
  }
}
