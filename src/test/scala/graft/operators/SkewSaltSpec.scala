package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SkewSalt]]: the priced trigger flags exactly the above-floor keys
  * (and can only err toward over-salting — CMS overcounts), the
  * partially-salted join is EXACTLY the inner equi-join, and the
  * decision prices equally well off the streamed sketch artifact.
  */
class SkewSaltSpec extends SparkSpec {
  import spark.implicits._

  test("decideSalt flags the planted hot key and none of the uniform ones; sketchTotal is exact") {
    // 10k rows: key "hot" holds 20%, 99 uniform keys share the rest —
    // the AQE-unmarked regime (hot ≈ 1.6x a fair 1/8 share... no:
    // 20% vs fair 12.5% at parts=8 -> above the 2x floor? 0.2*8 = 1.6
    // < 2 -> NOT flagged at parts=8; at parts=32 fair is 3.125%,
    // 0.2*32 = 6.4 > 2 -> flagged. Both sides asserted.
    val items = ((0 until 2000).map(_ => "hot") ++
      (0 until 8000).map(i => s"k${i % 99}")).toDF("item")
    val sk = CountMin.sketch(items, 4, 512).localCheckpoint()
    val total = SkewSalt.sketchTotal(sk)
    assert(total.head().getLong(0) == 10000L, "sketch total must be exact")
    def flagged(parts: Int): Set[String] =
      SkewSalt.decideSalt(items.distinct(), sk, 4, 512, total, parts)
        .where(col("salt")).collect().map(_.getString(0)).toSet
    assert(flagged(32) == Set("hot"),
      "at parts=32 only the 20% key clears the 2x fair-share floor")
    assert(flagged(8) == Set.empty,
      "at parts=8 a 20% key is under 2x the 12.5% fair share")
  }

  test("saltedEquiJoin == the plain inner equi-join: hot keys, duplicate build rows, probe-only and build-only keys") {
    val rnd = new Random(42)
    val fact = ((0 until 500).map(i => (0L, i.toLong)) ++ // hot key 0
      (0 until 500).map(i => (1L + rnd.nextInt(50), 1000L + i)) ++
      Seq((97L, 9L))) // key absent from dim -> drops
      .toDF("k", "fid")
    val dim = ((0 until 30).map(i => (i.toLong, s"d$i")) ++
      Seq((0L, "dup0"), (3L, "dup3"), // duplicate build rows multiply
        (98L, "only"))) // key absent from fact -> drops
      .toDF("k", "w")
    val hot = Seq(0L, 3L).toDF("k")
    val plain = fact.join(dim, "k")
      .select("k", "fid", "w").collect().map(_.toSeq)
    val salted = SkewSalt.saltedEquiJoin(fact, dim, "k", hot, salts = 7,
        saltOn = col("fid"))
      .select("k", "fid", "w").collect().map(_.toSeq)
    // multiset equality: duplicate (k, fid, w) combinations must keep
    // their multiplicity
    assert(salted.groupBy(identity).view.mapValues(_.size).toMap ==
      plain.groupBy(identity).view.mapValues(_.size).toMap,
      "salted join is not the inner join")
    assert(plain.nonEmpty)
    intercept[IllegalArgumentException] {
      SkewSalt.saltedEquiJoin(fact, dim, "k", hot, salts = 1,
        saltOn = col("fid"))
    }
  }

  test("the decision prices off the STREAMED sketch artifact (CountMinStream cells)") {
    import graft.streaming.CountMinStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-saltcms").toString
    val fn = CountMinStream.pipeline(dir, d = 4, w = 512)
    // three batches (one single-token text row per item); key "hh" is
    // 25% of the whole stream
    (0 until 3).foreach { b =>
      fn(((0 until 250).map(_ => "hh") ++
        (0 until 750).map(i => s"u${(b * 750 + i) % 97}")).toDF("text"),
        b.toLong)
    }
    val cells = CountMinStream.cells(spark, dir)
    val total = SkewSalt.sketchTotal(cells)
    assert(total.head().getLong(0) == 3000L,
      "stream-committed cells must price the exact total")
    val hot = SkewSalt.decideSalt(
        (Seq("hh") ++ (0 until 97).map(i => s"u$i")).toDF("item"),
        cells, 4, 512, total, parts = 32)
      .where(col("salt")).collect().map(_.getString(0)).toSet
    assert(hot == Set("hh"),
      s"streamed pricing must flag exactly the 25% key, got $hot")
  }
}
