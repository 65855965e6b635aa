package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: 3-grams of a 5-token doc; short docs yield whole text") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(TF.shingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1) == Seq("a b"))
  }

  test("shingles: native expression ≡ HOF reference on edge cases") {
    val texts = Seq("a b c d e", "a b", "", "a", "a  b", "one two three",
      "x y z x y z", "über straße ñandú tokyo 東京 data", "a b c")
    val df = texts.toDF("text").select(
      TF.shingles(col("text"), 3).as("native"),
      TF.shinglesHof(col("text"), 3).as("hof"))
    df.collect().zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for '$t'")
    }
  }

  test("hexHash60: matches an independent md5-prefix computation") {
    // int(md5('hello').hexdigest()[:15], 16) — cross-checked against
    // DuckDB's list_reduce hex fold, which the generated oracles embed.
    val h = Seq("hello").toDF("s")
      .select(TF.hexHash60(col("s"))).head().getLong(0)
    assert(h == 419982666956583591L)
  }

  test("jaccard: distinct token-set semantics") {
    val df = Seq(("a b c a", "b c d")).toDF("x", "y")
      .select(TF.jaccard(
        array_distinct(TF.tokens(col("x"))),
        array_distinct(TF.tokens(col("y")))).as("j"))
    // {a,b,c} vs {b,c,d}: |∩|=2, |∪|=4
    assert(df.head().getDouble(0) == 0.5)
  }

  test("langPredict: marker argmax with first-wins tie-break and und fallback") {
    val df = Seq(
      "the quick the join",   // en (the ×2)
      "der the der the",      // tie de/en → de (first in marker order)
      "scan filter join")     // no markers → und
      .toDF("text").select(TF.langPredict(col("text")).as("p"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "und"))
  }

  test("minhash signature: identical docs identical, length = numPerms") {
    val df = Seq("x y z w v u t s", "x y z w v u t s", "completely different words here")
      .toDF("text")
      .select(TF.minhashSignature(TF.shingles(col("text"), 3), 64).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 64)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("rollingFingerprint: order-sensitive, deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TF.rollingFingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < TF.MinhashPrime))
  }

  test("qualityScore components behave directionally") {
    val df = Seq(
      "unique tokens only here now",      // high diversity, no stopwords
      "the the the the the")              // all stopwords, no diversity
      .toDF("text")
      .select(TF.qualityScore(col("text")).as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs(0) > qs(1))
  }
}
