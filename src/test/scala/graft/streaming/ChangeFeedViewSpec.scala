package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental view must equal the one-shot aggregate of the
  * upsert store's current rows — bit-exactly, for ANY refresh cadence
  * — while only ever reading feed rows it has not seen.
  */
class ChangeFeedViewSpec extends SparkSpec {
  import spark.implicits._

  private type Up = (Long, String, Long, Long, Double)

  private def df(s: Seq[Up]) =
    s.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  private def corpus(seed: Int): Seq[Up] = {
    val rnd = new Random(seed)
    (0 until 600).map { i =>
      (rnd.nextInt(30).toLong, "t" + rnd.nextInt(3),
        rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble() * 100)
    }
  }

  private def slice(ups: Seq[Up], n: Int, seed: Int): Seq[Seq[Up]] = {
    val rnd = new Random(seed)
    val tagged = ups.map(u => (rnd.nextInt(n), u))
    (0 until n).map(b => tagged.filter(_._1 == b).map(_._2))
      .filter(_.nonEmpty)
  }

  private def viewRows(viewDir: String): Set[(String, Long, Long)] =
    ChangeFeedView.table(spark, viewDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** One-shot truth: the identical aggregate over a current-row df. */
  private def oneShot(cur: org.apache.spark.sql.DataFrame)
      : Set[(String, Long, Long)] =
    cur.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(round(col("value") * 1e6).cast("long"), lit(0L)))
          .as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("view == one-shot aggregate of the store for every refresh cadence, at every step") {
    val stateDir = Files.createTempDirectory("graft-cfvstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val slices = slice(corpus(7), 6, 9)
    val everyDir = Files.createTempDirectory("graft-cfv1").toString
    val lazyDir = Files.createTempDirectory("graft-cfv3").toString
    val onceDir = Files.createTempDirectory("graft-cfvN").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      ChangeFeedView.refresh(spark, stateDir, everyDir)
      if (i % 3 == 2) ChangeFeedView.refresh(spark, stateDir, lazyDir)
      // the every-batch view tracks the store exactly at each step
      assert(viewRows(everyDir) ==
        oneShot(CowUpsertStream.latestAt(spark, stateDir, i.toLong)),
        s"every-batch cadence after batch $i")
    }
    ChangeFeedView.refresh(spark, stateDir, lazyDir)
    ChangeFeedView.refresh(spark, stateDir, onceDir)
    val truth = oneShot(CowUpsertStream.latest(spark, stateDir))
    assert(viewRows(everyDir) == truth)
    assert(viewRows(lazyDir) == truth, "every-3rd cadence converges")
    assert(viewRows(onceDir) == truth, "single end refresh converges")
  }

  test("refresh is idempotent: nothing new folds nothing and commits nothing") {
    val stateDir = Files.createTempDirectory("graft-cfvid").toString
    val viewDir = Files.createTempDirectory("graft-cfvidv").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 4)
    fn(df(Seq((1L, "a", 10L, 1L, 2.5))), 0L)
    assert(ChangeFeedView.refresh(spark, stateDir, viewDir) == 1L)
    val metaBefore = ChangeFeedView.readMeta(spark, viewDir)
    assert(ChangeFeedView.refresh(spark, stateDir, viewDir) == 0L)
    assert(ChangeFeedView.readMeta(spark, viewDir) == metaBefore)
    assert(viewRows(viewDir) == Set(("a", 1L, 2500000L)))
  }

  test("delete ops fold: count and sum drop; a fully-deleted key leaves the view") {
    val stateDir = Files.createTempDirectory("graft-cfvdel").toString
    val viewDir = Files.createTempDirectory("graft-cfvdelv").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 4)
    fn(df(Seq((1L, "a", 10L, 1L, 2.0), (2L, "a", 10L, 2L, 3.0),
      (3L, "b", 10L, 3L, 7.0))), 0L)
    ChangeFeedView.refresh(spark, stateDir, viewDir)
    assert(viewRows(viewDir) ==
      Set(("a", 2L, 5000000L), ("b", 1L, 7000000L)))
    CowUpsertStream.delete(spark, stateDir,
      Seq((2L, "a"), (3L, "b")).toDF("user_id", "event_type"))
    ChangeFeedView.refresh(spark, stateDir, viewDir)
    assert(viewRows(viewDir) == Set(("a", 1L, 2000000L)),
      "type b fully deleted must leave the view")
    assert(viewRows(viewDir) ==
      oneShot(CowUpsertStream.latest(spark, stateDir)))
  }

  // ---- the generalized delta algebra (DeltaViews) -------------------

  private def momentRows(viewDir: String)
      : Set[(String, Long, BigInt, BigInt, BigInt, BigInt, BigInt)] =
    MomentFeedView.table(spark, viewDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger),
        BigInt(r.getDecimal(3).toBigInteger),
        BigInt(r.getDecimal(4).toBigInteger),
        BigInt(r.getDecimal(5).toBigInteger),
        BigInt(r.getDecimal(6).toBigInteger))).toSet

  private def momentTruth(cur: org.apache.spark.sql.DataFrame)
      : Set[(String, Long, BigInt, BigInt, BigInt, BigInt, BigInt)] =
    MomentFeedView.oneShot(cur).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger),
        BigInt(r.getDecimal(3).toBigInteger),
        BigInt(r.getDecimal(4).toBigInteger),
        BigInt(r.getDecimal(5).toBigInteger),
        BigInt(r.getDecimal(6).toBigInteger))).toSet

  test("moment view == one-shot moment vector at every cadence, incl. delete generations") {
    val stateDir = Files.createTempDirectory("graft-mfvstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val slices = slice(corpus(21), 5, 23)
    val everyDir = Files.createTempDirectory("graft-mfv1").toString
    val onceDir = Files.createTempDirectory("graft-mfvN").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      MomentFeedView.refresh(spark, stateDir, everyDir)
      assert(momentRows(everyDir) ==
        momentTruth(CowUpsertStream.latestAt(spark, stateDir, i.toLong)),
        s"moment cadence after batch $i")
    }
    // a delete generation, folded in one catch-up refresh by BOTH views
    CowUpsertStream.delete(spark, stateDir,
      Seq((1L, "t0"), (2L, "t1"), (3L, "t2")).toDF("user_id", "event_type"))
    MomentFeedView.refresh(spark, stateDir, everyDir)
    MomentFeedView.refresh(spark, stateDir, onceDir)
    val truth = momentTruth(CowUpsertStream.latest(spark, stateDir))
    assert(momentRows(everyDir) == truth, "per-batch cadence + delete gen")
    assert(momentRows(onceDir) == truth, "single end refresh converges")
    // the derived stats read runs (sanity: one row per live event_type)
    assert(MomentFeedView.stats(spark, everyDir).count() == truth.size)
  }

  private def sketchRows(viewDir: String): Set[(String, Long, Long)] =
    SketchFeedView.table(spark, viewDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("sketch view == one-shot DDSketch of the store at every cadence, incl. deletes; quantiles answer off it") {
    val stateDir = Files.createTempDirectory("graft-sfvstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val slices = slice(corpus(31), 5, 33)
    val everyDir = Files.createTempDirectory("graft-sfv1").toString
    val onceDir = Files.createTempDirectory("graft-sfvN").toString
    def truth(): Set[(String, Long, Long)] =
      graft.operators.DDSketch.sketchBy(
          CowUpsertStream.latest(spark, stateDir)
            .select(col("event_type"), col("value")),
          0.01, Seq("event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      SketchFeedView.refresh(spark, stateDir, everyDir)
    }
    CowUpsertStream.delete(spark, stateDir,
      Seq((4L, "t0"), (5L, "t1")).toDF("user_id", "event_type"))
    SketchFeedView.refresh(spark, stateDir, everyDir)
    SketchFeedView.refresh(spark, stateDir, onceDir)
    val t = truth()
    assert(sketchRows(everyDir) == t, "per-batch cadence + delete gen")
    assert(sketchRows(onceDir) == t, "single end refresh converges")
    // quantiles read: est within alpha of a brute-force percentile
    val q50 = SketchFeedView.quantiles(spark, everyDir, Seq(0.5))
    assert(q50.count() == t.map(_._1).size)
    // alpha mismatch refuses
    assert(intercept[IllegalStateException] {
      SketchFeedView.refresh(spark, stateDir, everyDir, alpha = 0.05)
    }.getMessage.contains("grids"))
  }

  test("null values move the sum by exactly the non-null side") {
    val stateDir = Files.createTempDirectory("graft-cfvnull").toString
    val viewDir = Files.createTempDirectory("graft-cfvnullv").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 4)
    fn(df(Seq((1L, "a", 10L, 1L, 5.0))), 0L)
    ChangeFeedView.refresh(spark, stateDir, viewDir)
    assert(viewRows(viewDir) == Set(("a", 1L, 5000000L)))
    // update to a NULL value: count keeps the row, sum drops the 5.0
    val nullUpdate = Seq[(java.lang.Long, String, java.lang.Long,
        java.lang.Long, java.lang.Double)]((1L, "a", 20L, 2L, null))
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
    fn(nullUpdate, 1L)
    ChangeFeedView.refresh(spark, stateDir, viewDir)
    assert(viewRows(viewDir) == Set(("a", 1L, 0L)))
    fn(df(Seq((1L, "a", 30L, 3L, 7.0))), 2L)
    ChangeFeedView.refresh(spark, stateDir, viewDir)
    assert(viewRows(viewDir) == Set(("a", 1L, 7000000L)))
  }
}
