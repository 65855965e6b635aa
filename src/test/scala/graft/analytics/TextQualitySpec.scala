package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** Planted-document semantics for the repetition filter (TXT-9): the
  * metrics and decision must flag engineered degenerate docs and pass
  * normal ones — independent of the oracle corpus.
  */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def metricsFor(text: String) = {
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("top"))
      .head()
    (tok.getLong(1), tok.getLong(2), tok.getLong(3))
  }

  test("repetition metrics: the degenerate all-one-token doc maxes out") {
    val (n, d, top) = metricsFor(Seq.fill(40)("spam").mkString(" "))
    assert(n == 40 && d == 1 && top == 40)
  }

  test("repetition filter drops the planted loop doc, keeps the varied one") {
    // A 'keep' doc needs top-token ≤ 12% (→ ≥ 9 distinct over 72 tokens
    // here) and dup_frac ≤ 0.65; the loop doc repeats one bigram.
    val varied = (0 until 72).map(i => s"tok${i % 36}").mkString(" ")
    val loop = Seq.fill(30)("click here").mkString(" ")
    val docs = Seq((0L, varied), (1L, loop)).toDF("doc_id", "text")
    // Reuse the operator body via a temp table the query function reads:
    // simplest is to run the same expression stack directly.
    val tokCounts = docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"), max("c").as("top_tok"))
    val bgCounts = docs
      .select(col("doc_id"), explode(TF.shingles(col("text"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram"))
    val out = tokCounts.join(bgCounts, "doc_id")
      .select(col("doc_id"),
        round(col("top_tok").cast("double") / col("n_tokens"), 6).as("ttf"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6).as("df"),
        round(col("top_bigram").cast("double") * 2.0 / col("n_bigrams"), 6).as("tbf"))
      .withColumn("keep", col("ttf") <= 0.12 && col("df") <= 0.65 && col("tbf") <= 0.10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(0L), "varied doc must pass the filter")
    assert(!out(1L), "repeated-bigram doc must be dropped")
  }

  test("approx_percentile within tolerance of exact percentiles on lineitem") {
    // Like the HLL check (q_rel10b): Spark's GK sketch has no DuckDB
    // mirror, so pin it against Spark's own exact percentile at both
    // correctness SFs — relative error of the value at p50/p90 ≤ 2%.
    for (sf <- Seq("0.01", "0.1")) {
      val li = graft.sources.Tables.lineitem(spark, s"/root/testdata/sf$sf")
      val row = li.agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("a"),
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("e")).head()
      val approx = row.getSeq[Double](0)
      val exact = row.getSeq[Double](1)
      approx.zip(exact).zip(Seq("p50", "p90")).foreach { case ((a, e), p) =>
        val rel = math.abs(a - e) / e
        info(f"sf$sf $p approx=$a%.2f exact=$e%.2f rel=$rel%.4f")
        assert(rel <= 0.02, f"$p at sf$sf off by $rel%.4f")
      }
    }
  }

  test("bigramLogProb: planted corpus matches a driver-side reference; short docs drop") {
    // d0/d1 share vocabulary but not word ORDER statistics; d2 is a
    // 1-token doc (no bigram — must drop out but still count in V).
    val planted = Seq(
      (0L, "x y x y"), (1L, "y x q"), (2L, "z"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bigram").toString
    planted.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    // Reference from first principles.
    val toks = planted.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val v = toks.flatMap(_._2).distinct.size.toDouble
    val bigrams = toks.map { case (id, ts) =>
      id -> ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }.filter(_._2.nonEmpty)
    val c2 = bigrams.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toDouble).toMap
    val c1 = bigrams.flatMap(_._2).groupBy(_.split(" ", -1).head).view
      .mapValues(_.size.toDouble).toMap
    val expected = bigrams.map { case (id, gs) =>
      val lp = gs.map(g => math.log(
        (c2(g) + 1.0) / (c1(g.split(" ", -1).head) + v))).sum / gs.size
      (id, gs.size.toLong,
        BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)

    val got = ExtensionQueries.bigramLogProb(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(0L, 1L), "the bigram-less doc drops out")
    assert(got == expected, s"got $got want $expected")
  }

  test("negativeSampling: intervals tile [0,1), every draw maps once, popularity wins") {
    // Planted skew: counts 81/16/1 → unigram^0.75 weights 27/8/1 →
    // shares 75%/22%/3%. 100 deterministic draws.
    val text =
      (Seq.fill(81)("aa") ++ Seq.fill(16)("bb") ++ Seq("cc")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-negsamp").toString
    Seq((0L, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = ExtensionQueries.negativeSampling(spark, dir).collect()
    // Exactly one word per (ctx, draw): the cumulative intervals tile
    // [0,1) with no gap or overlap, so the containment join is a
    // function.
    assert(rows.length == 100, s"every draw maps exactly once: ${rows.length}")
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 100)
    val freq = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(freq.keySet.subsetOf(Set("aa", "bb", "cc")))
    // Popularity correction: the 75%-share word must dominate the
    // 22%-share word (deterministic draws — this is a fixed fact of the
    // md5 sequence, not a statistical hope).
    assert(freq.getOrElse("aa", 0) > freq.getOrElse("bb", 0),
      s"popularity-corrected draws: $freq")
    assert(freq.getOrElse("aa", 0) >= 60 && freq.getOrElse("aa", 0) <= 90,
      s"share ~75% of 100 draws: $freq")
    // Determinism: a second run reproduces the draws bit-for-bit.
    val again = ExtensionQueries.negativeSampling(spark, dir).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }
}
