package graft.analytics

import java.nio.file.Files

import graft.SparkSpec

/** Planted-corpus semantics for the ranking ops (TXT-11 TF-IDF, TXT-12
  * BM25): salience and retrieval ordering must come out right on
  * engineered documents, independent of the oracle corpus. The planted
  * docs are written as a `documents.parquet` so the tests exercise the
  * exact query functions the driver runs.
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  /** Write a (doc_id, text) corpus in the documents-table shape and
    * return the directory the query functions read.
    */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-rank").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tf-idf: repeated rare term tops; ubiquitous term weighs zero") {
    val dir = corpusDir(Seq(
      0L -> "common alpha alpha alpha alpha",
      1L -> "common beta other",
      2L -> "common gamma words here",
      3L -> "common delta more words"))
    val rows = ExtensionQueries.tfidfTop(spark, dir).collect()
    // 'alpha': tf=4 in one of 4 docs → 4·ln(4) — the top weight.
    val top = rows.head
    assert(top.getLong(0) == 0L && top.getString(1) == "alpha",
      s"expected (0, alpha) on top, got $top")
    assert(math.abs(top.getDouble(2) - 4 * math.log(4.0)) < 1e-6)
    // 'common' appears in every doc → ln(1) = 0 exactly.
    val common = rows.filter(_.getString(1) == "common")
    assert(common.forall(_.getDouble(2) == 0.0),
      "ubiquitous term must carry zero tf-idf")
  }

  test("bm25: more matched terms rank higher; non-matching docs absent") {
    val filler = (0 until 20).map(i => s"f$i").mkString(" ")
    val dir = corpusDir(Seq(
      0L -> s"hash join vector $filler", // all three query terms
      1L -> s"hash join $filler",        // two
      2L -> s"hash $filler",             // one
      3L -> s"nothing relevant $filler")) // zero → absent from ranking
    val rows = ExtensionQueries.bm25Rank(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L),
      s"expected docs ranked 0,1,2 and doc 3 absent, got ${rows.mkString(",")}")
    val s = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L))
  }

  test("ngram contamination: flags the doc sharing a planted 8-gram, not others") {
    // doc 10 is benchmark (doc_id % 10 == 0); doc 1 embeds one of its
    // 8-grams verbatim, doc 2 shares only shorter overlaps.
    val leaked = "alpha beta gamma delta epsilon zeta eta theta"
    val pad = (0 until 12).map(i => s"x$i").mkString(" ")
    val pad2 = (0 until 12).map(i => s"y$i").mkString(" ")
    val dir = corpusDir(Seq(
      10L -> s"$leaked $pad",
      1L -> s"$pad2 $leaked",
      2L -> s"alpha beta gamma $pad2 delta epsilon zeta"))
    val rows = ExtensionQueries.ngramContamination(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L),
      s"only doc 1 leaks a full 8-gram, got ${rows.mkString(",")}")
    assert(rows.head.getLong(1) == 1L)
  }

  test("temperature sampling: deterministic, and rates ordered by quality") {
    // A corpus split into a high-quality lang (varied tokens) and a
    // low-quality lang (repetitive) — flattened sampling must keep a
    // higher fraction of the high-quality cohort, and repeat runs must
    // agree exactly (hash-based acceptance, no RNG).
    import org.apache.spark.sql.functions._
    val hi = (0 until 40).map(d => d.toLong ->
      (0 until 40).map(i => s"w${(d * 7 + i * 3) % 97}").mkString(" "))
    val lo = (100 until 140).map(d => d.toLong ->
      (s"the a of doc$d " + Seq.fill(6)("the a of").mkString(" ")))
    val dir = Files.createTempDirectory("graft-rank").toString
    (hi ++ lo).toDF("doc_id", "text")
      .withColumn("lang", when(col("doc_id") < 100, "en").otherwise("zz"))
      .selectExpr("doc_id", "text", "lang", "'test' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = ExtensionQueries.temperatureSample(spark, dir).collect()
    val r2 = ExtensionQueries.temperatureSample(spark, dir).collect()
    assert(r1.toSeq == r2.toSeq, "hash-based sampling must be reproducible")
    val byLang = r1.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang("en")._1 == 40 && byLang("zz")._1 == 40)
    assert(byLang("en")._2 > byLang("zz")._2,
      s"high-quality cohort must keep more docs: $byLang")
  }

  test("bm25: length normalization favors the shorter doc at equal tf") {
    val shortPad = (0 until 10).map(i => s"p$i").mkString(" ")
    val longPad = (0 until 80).map(i => s"q$i").mkString(" ")
    val dir = corpusDir(Seq(
      0L -> s"hash join $shortPad",
      1L -> s"hash join $longPad"))
    val s = ExtensionQueries.bm25Rank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(0L) > s(1L),
      s"same tf but shorter doc must score higher: $s")
  }
}
