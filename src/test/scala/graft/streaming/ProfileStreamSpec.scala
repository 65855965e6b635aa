package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Three merge algebras, each pinned against its own one-shot truth:
  * counters and lattice min/max against the EXACT batch profile over
  * the union of all delivered rows; the distinct estimate against the
  * exact union FOLD of the per-batch sketches (the HllStream law —
  * "one-shot over all rows" is not the right reference, because the
  * engine's union keeps HIP for sparse inputs and drops it for dense
  * ones, so different slicings may estimate ±1 apart) plus the lgK
  * error envelope vs the exact distinct count. Plus the
  * family contract: replay skip, stale refuse, shape/lgK signature
  * refuse, fresh read, engine leg.
  */
class ProfileStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Rec = (Long, Option[Double], Option[String])

  private def df(s: Seq[Rec]) = s.toDF("k", "x", "s")

  private def corpus(seed: Int): Seq[Rec] = {
    val rnd = new Random(seed)
    (0 until 500).map { i =>
      (rnd.nextInt(97).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 40 - 20),
        if (rnd.nextInt(7) == 0) None else Some("w" + rnd.nextInt(50)))
    }
  }

  private def slice(rs: Seq[Rec], n: Int, seed: Int): Seq[Seq[Rec]] = {
    val rnd = new Random(seed)
    val tagged = rs.map(r => (rnd.nextInt(n), r))
    (0 until n).map(b => tagged.filter(_._1 == b).map(_._2))
      .filter(_.nonEmpty)
  }

  private def streamed(dir: String): Map[String, (Long, Long, Long, String, String)] =
    ProfileStream.profile(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))
    }.toMap

  test("counters + lattice == exact batch profile; distinct estimate == one-shot sketch EXACTLY, after every batch") {
    val dir = Files.createTempDirectory("graft-profstream").toString
    val fn = ProfileStream.pipeline(dir, Seq("k", "x", "s"), lgK = 12)
    val slices = slice(corpus(3), 4, 5)
    slices.zipWithIndex.foreach { case (sl, i) =>
      fn(df(sl), i.toLong)
      val seen = df(slices.take(i + 1).flatten)
      val exact = Profile.profile(seen, Seq("k", "x", "s")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))
        .toMap
      val got = streamed(dir)
      for (c <- Seq("k", "x", "s")) {
        val (n, nn, mn, mx) = exact(c)
        val (gn, gnn, _, gmn, gmx) = got(c)
        assert((gn, gnn, gmn, gmx) == (n, nn, mn, mx),
          s"col $c after batch $i")
      }
      // The sketch law, in its honest form (the HllStream lesson,
      // sharpened here: DataSketches' union keeps the HIP accumulator
      // when fed sparse coupon inputs but drops it for dense ones, so
      // two DIFFERENT slicings of the same rows can legitimately
      // estimate ±1 apart — "one-shot over all rows" is not the right
      // reference). What the state DOES guarantee: the committed
      // sketch is the exact union fold of the per-batch sketches —
      // pinned by replaying those sketches through one hll_union_agg —
      // and the estimate carries the engine's lgK error envelope vs
      // the exact distinct count of the canonical domain.
      for (c <- Seq("k", "x", "s")) {
        def v(d: org.apache.spark.sql.DataFrame) =
          Profile.canon(col(c), d.schema(c).dataType)
        val batchSketches = slices.take(i + 1)
          .map(sl => df(sl).agg(hll_sketch_agg(v(df(sl)), lit(12)).as("sk")))
          .reduce(_ unionByName _)
        val folded = batchSketches
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
          .head().getLong(0)
        assert(got(c)._3 == folded, s"sketch fold($c) after batch $i")
        val exactNd = seen.select(v(seen)).where(col(c).isNotNull)
          .distinct().count()
        assert(math.abs(got(c)._3 - exactNd) <=
          math.max(2L, (5 * 1.04 / math.sqrt(1 << 12) * exactNd).toLong),
          s"envelope($c): est ${got(c)._3} vs exact $exactNd")
      }
    }
  }

  test("an all-null column profiles n_null == n_rows and estimates 0") {
    val dir = Files.createTempDirectory("graft-profnull").toString
    val fn = ProfileStream.pipeline(dir, Seq("k", "x", "s"))
    fn(Seq[(Long, Option[Double], Option[String])](
      (1L, None, None), (2L, None, None)).toDF("k", "x", "s"), 0L)
    val got = streamed(dir)
    assert(got("x") == (2L, 2L, 0L, null, null))
    assert(got("s") == (2L, 2L, 0L, null, null))
    assert(got("k")._3 == 2L)
  }

  test("replay skips; stale, shape-change and lgK-change refuse; fresh state reads empty") {
    val dir = Files.createTempDirectory("graft-profguards").toString
    assert(ProfileStream.profile(spark, dir).count() == 0L)
    val fn = ProfileStream.pipeline(dir, Seq("k", "x", "s"))
    val slices = slice(corpus(7), 3, 9)
    slices.zipWithIndex.foreach { case (sl, i) => fn(df(sl), i.toLong) }
    val before = streamed(dir)
    val metaBefore = ProfileStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(streamed(dir) == before)
    assert(ProfileStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    intercept[IllegalStateException] { // fewer columns = different shape
      ProfileStream.pipeline(dir, Seq("k", "x"))(df(slices.head), 9L)
    }
    intercept[IllegalStateException] { // same col name, different kind
      ProfileStream.pipeline(dir, Seq("k", "x", "s"))(
        df(slices.head).withColumn("x", col("x").cast("string")), 9L)
    }
    intercept[IllegalStateException] { // different sketch precision
      ProfileStream.pipeline(dir, Seq("k", "x", "s"), lgK = 14)(
        df(slices.head), 9L)
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot profile") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-profengine").toString
    val fn = ProfileStream.pipeline(dir, Seq("k", "x", "s"))
    val mem = MemoryStream[Rec]
    val q = mem.toDF().toDF("k", "x", "s")
      .writeStream.foreachBatch(fn).start()
    val slices = slice(corpus(11), 3, 13)
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = df(slices.flatten)
    val exact = Profile.profile(all, Seq("k", "x", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4), r.getString(5))).toMap
    val got = streamed(dir)
    for (c <- Seq("k", "x", "s")) {
      val (n, nn, mn, mx) = exact(c)
      assert((got(c)._1, got(c)._2, got(c)._4, got(c)._5) == (n, nn, mn, mx))
    }
  }
}
