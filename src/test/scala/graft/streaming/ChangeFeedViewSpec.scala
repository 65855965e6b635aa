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

  // ---- keyed (grouped) views -----------------------------------------

  private def viewRows2(viewDir: String): Set[(String, Long, Long, Long)] =
    ChangeFeedView.table(spark, viewDir, Seq("event_type", "user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def oneShot2(cur: org.apache.spark.sql.DataFrame)
      : Set[(String, Long, Long, Long)] =
    cur.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(round(col("value") * 1e6).cast("long"), lit(0L)))
          .as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("two-column keyed view == one-shot at every cadence, incl. a delete generation; key mismatch refuses") {
    val keys = Seq("event_type", "user_id")
    val stateDir = Files.createTempDirectory("graft-cfv2kstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val slices = slice(corpus(41), 5, 43)
    val everyDir = Files.createTempDirectory("graft-cfv2k1").toString
    val onceDir = Files.createTempDirectory("graft-cfv2kN").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      ChangeFeedView.refresh(spark, stateDir, everyDir, keys)
      assert(viewRows2(everyDir) ==
        oneShot2(CowUpsertStream.latestAt(spark, stateDir, i.toLong)),
        s"two-key cadence after batch $i")
    }
    // a delete generation folds through the keyed view too
    CowUpsertStream.delete(spark, stateDir,
      Seq((1L, "t0"), (2L, "t1"), (7L, "t2")).toDF("user_id", "event_type"))
    ChangeFeedView.refresh(spark, stateDir, everyDir, keys)
    ChangeFeedView.refresh(spark, stateDir, onceDir, keys)
    val truth = oneShot2(CowUpsertStream.latest(spark, stateDir))
    assert(viewRows2(everyDir) == truth, "keyed cadence + delete gen")
    assert(viewRows2(onceDir) == truth, "keyed single refresh converges")
    // a reader/refresher with different keys cannot regroup the state
    assert(intercept[IllegalStateException] {
      ChangeFeedView.refresh(spark, stateDir, everyDir)
    }.getMessage.contains("regroup"))
    assert(intercept[IllegalStateException] {
      ChangeFeedView.table(spark, everyDir, Seq("user_id")).collect()
    }.getMessage.contains("regroup"))
    // a non-key grouping column refuses eagerly (before/after variance)
    assert(intercept[IllegalArgumentException] {
      ChangeFeedView.refresh(spark, stateDir, onceDir, Seq("value"))
    }.getMessage.contains("CDC key columns"))
  }

  test("keyed moment and sketch views converge to their keyed one-shots after deletes") {
    val keys = Seq("event_type", "user_id")
    val stateDir = Files.createTempDirectory("graft-dv2kstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    slice(corpus(51), 4, 53).zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
    }
    CowUpsertStream.delete(spark, stateDir,
      Seq((3L, "t0"), (9L, "t1")).toDF("user_id", "event_type"))
    val mDir = Files.createTempDirectory("graft-dv2km").toString
    val sDir = Files.createTempDirectory("graft-dv2ks").toString
    MomentFeedView.refresh(spark, stateDir, mDir, keys)
    SketchFeedView.refresh(spark, stateDir, sDir, keys = keys)
    val latest = CowUpsertStream.latest(spark, stateDir)
    val mGot = MomentFeedView.table(spark, mDir, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toString,
        r.getDecimal(3).toBigInteger, r.getDecimal(6).toBigInteger)).toSet
    val mWant = MomentFeedView.oneShot(latest, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toString,
        r.getDecimal(3).toBigInteger, r.getDecimal(6).toBigInteger)).toSet
    assert(mGot == mWant, "keyed moment view ≡ keyed one-shot")
    val sGot = SketchFeedView.table(spark, sDir, keys).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sWant = graft.operators.DDSketch.sketchBy(
        latest.select(col("event_type"), col("user_id"), col("value")),
        0.01, keys)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(sGot == sWant, "keyed sketch view ≡ keyed one-shot sketch")
  }

  test("derived keys on moment and sketch views: per-(type, segment) stats/quantiles == one-shot at every cadence incl. deletes; bad derivations refuse") {
    import org.apache.spark.sql.types.LongType
    val seg = Seq(DerivedKey("segment", pmod(col("user_id"), lit(4L)),
      LongType))
    val stateDir = Files.createTempDirectory("graft-dvdkstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val mDir = Files.createTempDirectory("graft-dvdkm").toString
    val sDir = Files.createTempDirectory("graft-dvdks").toString
    // refresh at EVERY batch (the tightest cadence), then once more
    // after a delete generation
    slice(corpus(91), 4, 93).zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      MomentFeedView.refresh(spark, stateDir, mDir, derived = seg)
      SketchFeedView.refresh(spark, stateDir, sDir, derived = seg)
    }
    CowUpsertStream.delete(spark, stateDir,
      Seq((3L, "t0"), (9L, "t1")).toDF("user_id", "event_type"))
    MomentFeedView.refresh(spark, stateDir, mDir, derived = seg)
    SketchFeedView.refresh(spark, stateDir, sDir, derived = seg)
    val latest = CowUpsertStream.latest(spark, stateDir)
    val mGot = MomentFeedView.table(spark, mDir, derived = seg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(4).toBigInteger, r.getDecimal(7).toBigInteger)).toSet
    val mWant = MomentFeedView.oneShot(latest, derived = seg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(4).toBigInteger, r.getDecimal(7).toBigInteger)).toSet
    assert(mGot == mWant, "segment moment view ≡ segment one-shot")
    assert(MomentFeedView.stats(spark, mDir, derived = seg)
      .columns.take(2).toSeq == Seq("event_type", "segment"))
    val sGot = SketchFeedView.table(spark, sDir, derived = seg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sWant = graft.operators.DDSketch.sketchBy(
        latest.withColumn("segment", pmod(col("user_id"), lit(4L)))
          .select(col("event_type"), col("segment"), col("value")),
        0.01, Seq("event_type", "segment"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(sGot == sWant, "segment sketch view ≡ segment one-shot sketch")
    // quantiles answer off the derived grouping
    assert(SketchFeedView.quantiles(spark, sDir, Seq(0.5), derived = seg)
      .columns.take(2).toSeq == Seq("event_type", "segment"))
    // value-derived refuses at declaration on both views
    assert(intercept[IllegalArgumentException] {
      MomentFeedView.refresh(spark, stateDir, mDir,
        derived = Seq(DerivedKey("vband", round(col("value")), LongType)))
    }.getMessage.contains("non-key columns"))
    assert(intercept[IllegalArgumentException] {
      SketchFeedView.refresh(spark, stateDir, sDir,
        derived = Seq(DerivedKey("vband", round(col("value")), LongType)))
    }.getMessage.contains("non-key columns"))
    // a reformulated derivation cannot regroup committed state
    val seg8 = Seq(DerivedKey("segment", pmod(col("user_id"), lit(8L)),
      LongType))
    assert(intercept[IllegalStateException] {
      MomentFeedView.refresh(spark, stateDir, mDir, derived = seg8)
    }.getMessage.contains("regroup"))
    assert(intercept[IllegalStateException] {
      SketchFeedView.refresh(spark, stateDir, sDir, derived = seg8)
    }.getMessage.contains("regroup"))
  }

  test("derived grouping key (user segment): view == one-shot per segment; value-derived and regrouped derivations refuse") {
    import org.apache.spark.sql.types.LongType
    val seg = Seq(DerivedKey("segment", pmod(col("user_id"), lit(4L)),
      LongType))
    val stateDir = Files.createTempDirectory("graft-cfvdkstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 8,
      compactEvery = 100)
    val slices = slice(corpus(81), 4, 83)
    val viewDir = Files.createTempDirectory("graft-cfvdk").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      ChangeFeedView.refresh(spark, stateDir, viewDir,
        Seq("event_type"), seg)
    }
    CowUpsertStream.delete(spark, stateDir,
      Seq((2L, "t0"), (6L, "t1")).toDF("user_id", "event_type"))
    ChangeFeedView.refresh(spark, stateDir, viewDir,
      Seq("event_type"), seg)
    val got = ChangeFeedView.table(spark, viewDir, Seq("event_type"), seg)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = CowUpsertStream.latest(spark, stateDir)
      .withColumn("segment", pmod(col("user_id"), lit(4L)))
      .groupBy("event_type", "segment")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(round(col("value") * 1e6).cast("long"), lit(0L)))
          .as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, "segment view != one-shot per (type, segment)")
    // a value-derived grouping refuses at declaration
    assert(intercept[IllegalArgumentException] {
      ChangeFeedView.refresh(spark, stateDir, viewDir, Seq("event_type"),
        Seq(DerivedKey("vband", round(col("value")), LongType)))
    }.getMessage.contains("non-key columns"))
    // a different derivation under the same name cannot regroup state
    assert(intercept[IllegalStateException] {
      ChangeFeedView.refresh(spark, stateDir, viewDir, Seq("event_type"),
        Seq(DerivedKey("segment", pmod(col("user_id"), lit(8L)),
          LongType)))
    }.getMessage.contains("regroup"))
    // a NON-DETERMINISTIC derivation analyzes fine against the key
    // probe but would route a change's add and subtract legs to
    // different groups — must refuse at declaration, not corrupt state
    assert(intercept[IllegalArgumentException] {
      ChangeFeedView.refresh(spark, stateDir, viewDir, Seq("event_type"),
        Seq(DerivedKey("lucky",
          (rand(42) * 4).cast(LongType).cast(LongType), LongType)))
    }.getMessage.contains("non-deterministic"))
    // a constant-only derivation (empty references) is a degenerate
    // group, not a function of the keys — refuse
    assert(intercept[IllegalArgumentException] {
      ChangeFeedView.refresh(spark, stateDir, viewDir, Seq("event_type"),
        Seq(DerivedKey("one", lit(1L), LongType)))
    }.getMessage.contains("at least one CDC key column"))
  }

  // ---- the capped (one-sided) sketch view ----------------------------

  test("capped sketch view: bounded state, quantile estimates only err HIGH after deletes, cap mismatch refuses") {
    val stateDir = Files.createTempDirectory("graft-sfvcapstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 4)
    // the scaladoc counterexample corpus: six values in six distinct
    // γ-buckets under one event_type, one per user key
    val vals = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0)
    fn(df(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, "a", 10L + i, i.toLong, v)
    }), 0L)
    val capDir = Files.createTempDirectory("graft-sfvcap").toString
    val exactDir = Files.createTempDirectory("graft-sfvexact").toString
    SketchFeedView.refresh(spark, stateDir, capDir, maxBuckets = Some(4))
    SketchFeedView.refresh(spark, stateDir, exactDir)
    assert(SketchFeedView.table(spark, capDir).count() == 4L,
      "cap bounds the per-key bucket count")
    assert(SketchFeedView.table(spark, exactDir).count() == 6L)
    // delete the TOP value — the collapse pooled the LOWEST buckets,
    // and that pooling is exactly what deletion cannot undo
    CowUpsertStream.delete(spark, stateDir,
      Seq((5L, "a")).toDF("user_id", "event_type"))
    SketchFeedView.refresh(spark, stateDir, capDir, maxBuckets = Some(4))
    SketchFeedView.refresh(spark, stateDir, exactDir)
    val qs = Seq(0.1, 0.3, 0.5)
    def ests(dir: String): Map[Double, Double] =
      SketchFeedView.quantiles(spark, dir, qs).collect()
        .map(r => (r.getDouble(1), r.getDouble(2))).toMap
    val capped = ests(capDir)
    val exact = ests(exactDir)
    // one-sidedness: pooled mass sits AT the pool cutoff, above where
    // the surviving low values actually are — capped ests never read
    // below the exact view's, and the pinned counterexample reads
    // strictly above at the low quantiles
    qs.foreach { q =>
      assert(capped(q) >= exact(q) * (1 - 1e-9),
        s"capped est at q=$q must not err low: ${capped(q)} vs ${exact(q)}")
    }
    assert(capped(0.1) > exact(0.1) * 1.5,
      "the counterexample's low-quantile upper bound is strict")
    // both views keep exact TOTAL counts (the cap pools, never drops)
    val nCap = SketchFeedView.table(spark, capDir)
      .agg(sum("n")).head().getLong(0)
    val nExact = SketchFeedView.table(spark, exactDir)
      .agg(sum("n")).head().getLong(0)
    assert(nCap == 5L && nExact == 5L)
    // the committed cap is part of the view's contract
    assert(intercept[IllegalStateException] {
      SketchFeedView.refresh(spark, stateDir, capDir)
    }.getMessage.contains("cap"))
    assert(intercept[IllegalStateException] {
      SketchFeedView.refresh(spark, stateDir, exactDir, maxBuckets = Some(4))
    }.getMessage.contains("cap"))
  }

  test("sketch view reads pre-cap committed state gracefully (null cap_buckets = uncapped)") {
    val stateDir = Files.createTempDirectory("graft-sfvoldstate").toString
    val fn = CowUpsertStream.pipeline(stateDir, buckets = 4)
    fn(df(Seq((1L, "a", 10L, 0L, 1.0), (2L, "a", 10L, 1L, 4.0),
      (3L, "b", 10L, 2L, 9.0))), 0L)
    val viewDir = Files.createTempDirectory("graft-sfvold").toString
    SketchFeedView.refresh(spark, stateDir, viewDir)
    // Rewrite the committed generation WITHOUT the cap_buckets /
    // view_keys columns — exactly what a sketch view committed before
    // those columns existed looks like on disk (the explicit read
    // schema resolves them to null).
    val gen = GenStore.latest(spark, viewDir)
    val gdir = GenStore.dir(viewDir, gen)
    // explicit OLD schema (pre-cap layout) — inference would trip on
    // the zero-length COMMITTED marker, exactly as FeedViewKeys notes
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("bucket", LongType), StructField("n", LongType),
      StructField("hw_gen", LongType),
      StructField("alpha_micro", LongType)))
    val rows = spark.read.schema(schema).parquet(gdir).collect().toSeq
    GenStore.deleteQuiet(spark, gdir)
    spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .coalesce(1).write.mode("overwrite").parquet(gdir)
    GenStore.commit(spark, viewDir, gen)
    // null cap_buckets must read as 0 (uncapped — the only mode that
    // existed then), not NPE
    val meta = SketchFeedView.readMeta(spark, viewDir)
    assert(meta.isDefined && meta.get._3 == 0L,
      s"pre-cap state must read cap=0, got $meta")
    // and an uncapped refresh over new feed data keeps working
    fn(df(Seq((4L, "a", 11L, 3L, 16.0))), 1L)
    SketchFeedView.refresh(spark, stateDir, viewDir)
    assert(SketchFeedView.table(spark, viewDir)
      .agg(sum("n")).head().getLong(0) == 4L)
    // while a capped refresh on the legacy-uncapped view still refuses
    assert(intercept[IllegalStateException] {
      SketchFeedView.refresh(spark, stateDir, viewDir,
        maxBuckets = Some(4))
    }.getMessage.contains("cap"))
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
