package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.RelationalQueries

/** The streamed SCD-2 store must serve EXACTLY the version table the
  * one-shot builder derives from the full log — for any slicing, for
  * out-of-order arrivals within the declared lateness, with deletes —
  * while its state collapses below the watermark and its per-batch IO
  * stays at bucket cost.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_type, ts_us, event_id, tier, is_delete) with
  // nullable tier — null is a real trackable state.
  private type Ev = (Long, String, Long, Long, Option[Long], Boolean)

  private def df(s: Seq[Ev]): DataFrame =
    s.toDF("user_id", "event_type", "ts_us", "event_id", "tier",
      "is_delete")

  /** Few keys, few tiers (collapse exercised hard), ~8% deletes,
    * unique (key, ts) so the window order is total.
    */
  private def corpus(seed: Int, n: Int = 500): Seq[Ev] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val tier = rnd.nextInt(4) match {
        case 0 => None // null tier: a real state
        case t => Some(t.toLong)
      }
      (rnd.nextInt(12).toLong, "t" + rnd.nextInt(2),
        i.toLong * 10 + rnd.nextInt(9), i.toLong, tier,
        rnd.nextInt(12) == 0)
    }
  }

  private def versionRows(d: DataFrame)
      : Set[(Long, String, Option[Long], Long, Option[Long], Long, Boolean)] =
    d.collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6))
    }.toSet

  test("arbitrary slicing under a full-span lateness: stream == one-shot at every step") {
    val dir = Files.createTempDirectory("graft-scd2a").toString
    val all = corpus(11)
    // lateness covers the whole ts range -> ANY slicing is in-watermark
    val fn = Scd2Stream.pipeline(dir, buckets = 8,
      latenessUs = all.map(_._3).max + 1, compactEvery = 100)
    val rnd = new Random(13)
    val tagged = all.map(e => (rnd.nextInt(5), e))
    val slices = (0 until 5).map(b => tagged.filter(_._1 == b).map(_._2))
    var seen = Seq.empty[Ev]
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      seen ++= s
      assert(versionRows(Scd2Stream.versions(spark, dir)) ==
        versionRows(Scd2Stream.scd2OfLog(df(seen))),
        s"after batch $i")
    }
  }

  test("tight lateness: the collapse drops provably-final rows and versions stay exact; asOf matches the interval filter") {
    val dir = Files.createTempDirectory("graft-scd2c").toString
    val all = corpus(17).sortBy(_._3) // watermark-ordered feed
    val lat = 200L
    val fn = Scd2Stream.pipeline(dir, buckets = 4, latenessUs = lat,
      compactEvery = 3) // compaction collapses untouched tails too
    val slices = all.grouped(60).toSeq
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val truth = Scd2Stream.scd2OfLog(df(all))
    assert(versionRows(Scd2Stream.versions(spark, dir)) ==
      versionRows(truth))
    // the state is versions + an in-watermark tail, NOT the log: with
    // 4 states a row repeats its predecessor's state ~1/4 of the time,
    // so the collapse must have dropped a visible fraction (~100 rows
    // at 500 events; the exact count is corpus-dependent)
    val keptRows = Scd2Stream.kept(spark, dir).count()
    assert(keptRows <= all.size - 50,
      s"collapse kept $keptRows of ${all.size} rows — not collapsing")
    // point-in-time read off the live store == interval filter of truth
    for (t <- Seq(all(100)._3, all(300)._3, all.last._3)) {
      val live = Scd2Stream.asOf(spark, dir, t).collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3), r.getLong(4))).toSet
      val want = truth
        .where(col("valid_from_us") <= t &&
          (col("valid_to_us").isNull || col("valid_to_us") > t))
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(5), r.getLong(3))).toSet
      assert(live == want, s"asOf($t)")
    }
  }

  test("deletes close the incumbent with no successor; re-insert at the pre-delete tier opens a NEW version") {
    val dir = Files.createTempDirectory("graft-scd2d").toString
    val fn = Scd2Stream.pipeline(dir, buckets = 2, latenessUs = 1000L)
    fn(df(Seq(
      (1L, "a", 100L, 1L, Some(5L), false),
      (1L, "a", 200L, 2L, None, true),      // delete: closes v1 at 200
      (1L, "a", 300L, 3L, Some(5L), false), // same tier, NEW version
      (2L, "a", 100L, 4L, Some(7L), false),
      (2L, "a", 150L, 5L, Some(7L), false)  // collapses: same state
    )), 0L)
    val vs = Scd2Stream.versions(spark, dir)
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6)))
    assert(vs.toSeq == Seq(
      (1L, 5L, 100L, Some(200L), 1L, false), // closed by the delete
      (1L, 5L, 300L, None, 2L, true),
      (2L, 7L, 100L, None, 1L, true)))
    // entity 1 absent at t=250 (deleted), present again at t=350
    assert(Scd2Stream.asOf(spark, dir, 250L)
      .where(col("user_id") === 1).count() == 0)
    assert(Scd2Stream.asOf(spark, dir, 350L)
      .where(col("user_id") === 1).count() == 1)
  }

  test("matches q_rel32's batch builder on the real events table") {
    val dir = Files.createTempDirectory("graft-scd2e").toString
    val sfDir = "/root/testdata/sf0.001"
    val log = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        expr("cast(get_json_object(props, '$.k') as bigint) div 25")
          .as("tier"))
      .localCheckpoint()
    val maxTs = log.agg(max("ts_us")).head().getLong(0)
    val fn = Scd2Stream.pipeline(dir, buckets = 8, latenessUs = maxTs,
      compactEvery = 100)
    // three arbitrary hash slices (full-span lateness permits any order)
    (0 until 3).foreach { b =>
      fn(log.where(pmod(col("event_id"), lit(3)) === b), b.toLong)
    }
    val got = Scd2Stream.versions(spark, dir)
    val want = RelationalQueries.scd2History(spark, sfDir)
    assert(versionRows(got) == versionRows(want),
      "streamed versions != q_rel32's history")
  }

  test("multi-attribute SCD-2: a struct attrType tracks N columns; one field changing opens ONE version; stream == one-shot under slicing") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val attrType = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    // (user, type, ts, id, a, b): attribute A changes while B holds,
    // then both hold (collapse), then B alone changes, then a null in
    // A (a real state under the field-wise null-safe compare).
    def log(rows: Seq[(Long, String, Long, Long, Option[Long], Long)]) =
      rows.toDF("user_id", "event_type", "ts_us", "event_id", "a", "b")
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), struct(col("a"), col("b")).as("tier"),
          lit(false).as("is_delete"))
    val rows = Seq[(Long, String, Long, Long, Option[Long], Long)](
      (1L, "t", 10L, 1L, Some(1L), 5L),
      (1L, "t", 20L, 2L, Some(2L), 5L), // A changes, B holds -> version
      (1L, "t", 30L, 3L, Some(2L), 5L), // both hold -> collapses
      (1L, "t", 40L, 4L, Some(2L), 6L), // B changes, A holds -> version
      (1L, "t", 50L, 5L, None, 6L),     // A -> null: a real new state
      (1L, "t", 60L, 6L, None, 6L))     // null == null: collapses
    val dir = Files.createTempDirectory("graft-scd2m").toString
    val fn = Scd2Stream.pipeline(dir, buckets = 4, latenessUs = 1000L,
      compactEvery = 100, attrType = attrType)
    // adversarial slicing: odd ids then even (in-watermark lateness)
    fn(log(rows.filter(_._4 % 2 == 1)), 0L)
    fn(log(rows.filter(_._4 % 2 == 0)), 1L)
    val got = Scd2Stream.versions(spark, dir, attrType)
      .select(col("user_id"), col("tier.a"), col("tier.b"),
        col("valid_from_us"), col("valid_to_us"), col("version"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toSet
    assert(got == Set(
      (1L, Some(1L), 5L, 10L, Some(20L), 1L),
      (1L, Some(2L), 5L, 20L, Some(40L), 2L), // ONE row for the A change
      (1L, Some(2L), 6L, 40L, Some(50L), 3L),
      (1L, None, 6L, 50L, None, 4L)),
      "field-wise null-safe struct compare: 4 versions, never 2 rows per change")
    // differential vs the one-shot builder over the same struct log
    assert(Scd2Stream.versions(spark, dir, attrType)
        .select("user_id", "event_type", "tier", "valid_from_us",
          "valid_to_us", "version", "is_current")
        .collect().map(_.toSeq).toSet ==
      Scd2Stream.scd2OfLog(log(rows))
        .collect().map(_.toSeq).toSet,
      "stream == scd2OfLog on the struct attribute")
  }

  test("watermark sentinel: an EMPTY first batch under lateness>0 does not poison the store") {
    val dir = Files.createTempDirectory("graft-scd2wm").toString
    val fn = Scd2Stream.pipeline(dir, buckets = 4, latenessUs = 50L)
    fn(df(Seq.empty[Ev]), 0L) // commits max_ts = sentinel
    // before the guard this refused: sentinel − lateness wrapped to a
    // huge positive watermark and every later row read as 'too late'
    fn(df(Seq((1L, "a", 1000L, 1L, Some(1L), false))), 1L)
    assert(versionRows(Scd2Stream.versions(spark, dir)) ==
      versionRows(Scd2Stream.scd2OfLog(
        df(Seq((1L, "a", 1000L, 1L, Some(1L), false))))))
  }

  test("live dwell == the dwell arithmetic over the one-shot versions (q_rel35's law off the store)") {
    val dir = Files.createTempDirectory("graft-scd2dw").toString
    val all = corpus(61, 300)
    val fn = Scd2Stream.pipeline(dir, buckets = 8,
      latenessUs = all.map(_._3).max + 1, compactEvery = 100)
    val rnd = new Random(67)
    val tagged = all.map(e => (rnd.nextInt(3), e))
    (0 until 3).foreach(b => fn(df(tagged.filter(_._1 == b).map(_._2)),
      b.toLong))
    val got = Scd2Stream.dwell(spark, dir).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
        r.getDouble(3))).toSet
    // the independent arithmetic: one-shot versions over the full log,
    // open intervals closed at the corpus max event time
    val mx = all.map(_._3).max
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    val want = Scd2Stream.scd2OfLog(df(all))
      .withColumn("dwell",
        coalesce(col("valid_to_us"), lit(mx)) - col("valid_from_us"))
      .groupBy("event_type", "tier").agg(sum("dwell").as("dwell_us"))
      .withColumn("share",
        round(col("dwell_us") / sum("dwell_us").over(byType), 6))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want, "live dwell must replay q_rel35's arithmetic " +
      "off <= state rows with the meta max as the close")
  }

  test("z-ordered compaction generations leave the version table exact (writeGen routing)") {
    val dir = Files.createTempDirectory("graft-scd2z").toString
    val all = corpus(71, 400)
    val fn = Scd2Stream.pipeline(dir, buckets = 4,
      latenessUs = all.map(_._3).max + 1, compactEvery = 2,
      zOrderOn = Some(ZOrder("ts_us", "user_id")))
    val rnd = new Random(73)
    val tagged = all.map(e => (rnd.nextInt(4), e))
    (0 until 4).foreach(b => fn(df(tagged.filter(_._1 == b).map(_._2)),
      b.toLong))
    assert(versionRows(Scd2Stream.versions(spark, dir)) ==
      versionRows(Scd2Stream.scd2OfLog(df(all))),
      "z-order is layout only — versions must be untouched")
  }

  test("beyond-watermark rows refuse; replay skips; stale/bucket/lateness mismatches refuse") {
    val dir = Files.createTempDirectory("graft-scd2r").toString
    val fn = Scd2Stream.pipeline(dir, buckets = 4, latenessUs = 50L)
    fn(df(Seq((1L, "a", 1000L, 1L, Some(1L), false))), 0L)
    val e = intercept[IllegalStateException] {
      fn(df(Seq((1L, "a", 100L, 2L, Some(2L), false))), 1L)
    }
    assert(e.getMessage.contains("watermark"))
    // replay of the committed high-water batch skips (state unchanged)
    val before = versionRows(Scd2Stream.versions(spark, dir))
    fn(df(Seq((9L, "z", 2000L, 9L, Some(9L), false))), 0L)
    assert(versionRows(Scd2Stream.versions(spark, dir)) == before)
    // stale batch refuses
    fn(df(Seq((1L, "a", 1010L, 3L, Some(2L), false))), 2L)
    assert(intercept[IllegalStateException] {
      fn(df(Seq((1L, "a", 1020L, 4L, Some(3L), false))), 1L)
    }.getMessage.contains("ahead of the stream"))
    // foreign layouts refuse
    assert(intercept[IllegalStateException] {
      Scd2Stream.pipeline(dir, buckets = 8, latenessUs = 50L)(
        df(Seq((1L, "a", 1030L, 5L, Some(3L), false))), 3L)
    }.getMessage.contains("bucketed"))
    assert(intercept[IllegalStateException] {
      Scd2Stream.pipeline(dir, buckets = 4, latenessUs = 99L)(
        df(Seq((1L, "a", 1030L, 5L, Some(3L), false))), 3L)
    }.getMessage.contains("lateness"))
  }

  test("fromFeed: the CDC changelog is the history's only ingest; stamped deletes close exactly; unstamped refuse; refolding folds nothing") {
    val feedDir = Files.createTempDirectory("graft-scd2feed").toString
    val scd2Dir = Files.createTempDirectory("graft-scd2feedh").toString
    val up = CowUpsertStream.pipeline(feedDir, buckets = 4,
      compactEvery = 100)
    // per-key strictly increasing ts across batches -> every row beats
    // its incumbent, so the feed's insert/update rows ARE the raw rows
    def batch(b: Int) = (0 until 8).map { k =>
      (k.toLong, "a", 100L * (b + 1) + k, (b * 8 + k).toLong,
        ((b + k) % 3).toDouble)
    }
    (0 until 3).foreach(b => up(df2(batch(b)), b.toLong))
    // stamped delete of keys 2 and 5 at t=10000
    CowUpsertStream.delete(spark, feedDir,
      Seq((2L, "a"), (5L, "a")).toDF("user_id", "event_type"),
      tombstoneTsUs = Some(10000L))
    // a post-delete re-insert batch (new versions must open)
    up(df2(Seq((2L, "a", 20000L, 100L, 1.0))), 3L)
    val folded = Scd2Stream.fromFeed(spark, feedDir, scd2Dir,
      buckets = 4, latenessUs = 1000000L)
    assert(folded > 0)
    // truth: the equivalent event log, one-shot
    val raw = (0 until 3).flatMap(batch)
    val lastId = raw.groupBy(_._1).view.mapValues(_.maxBy(_._3)._4).toMap
    val truth = raw.map(e =>
        (e._1, e._2, e._3, e._4, Some(e._5.round), false)) ++
      Seq(2L, 5L).map(k =>
        (k, "a", 10000L, lastId(k), None: Option[Long], true)) :+
      ((2L, "a", 20000L, 100L, Some(1L), false))
    assert(versionRows(Scd2Stream.versions(spark, scd2Dir)) ==
      versionRows(Scd2Stream.scd2OfLog(df(truth))),
      "feed-fed history != one-shot of the equivalent log")
    // key 5 ends deleted; key 2 reopened at 20000
    assert(Scd2Stream.asOf(spark, scd2Dir, 15000L)
      .where(col("user_id").isin(2L, 5L)).count() == 0)
    assert(Scd2Stream.asOf(spark, scd2Dir, 25000L)
      .where(col("user_id") === 2L).count() == 1)
    // idempotent: nothing new folds nothing
    assert(Scd2Stream.fromFeed(spark, feedDir, scd2Dir,
      buckets = 4, latenessUs = 1000000L) == 0L)
    // an UNstamped delete refuses at the fold
    CowUpsertStream.delete(spark, feedDir,
      Seq((3L, "a")).toDF("user_id", "event_type"))
    assert(intercept[IllegalStateException] {
      Scd2Stream.fromFeed(spark, feedDir, scd2Dir,
        buckets = 4, latenessUs = 1000000L)
    }.getMessage.contains("tombstone"))
  }

  test("fromFeed with a struct attrType: multi-attribute history off the CDC feed") {
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    val attrType = StructType(Seq(
      StructField("a", LongType), StructField("b", BooleanType)))
    // two tracked fields derived from the feed's after-image: the
    // rounded value and a threshold flag (null value -> both null)
    val tierCol = struct(round(col("value")).cast("long").as("a"),
      (col("value") >= 1.0).as("b"))
    val feedDir = Files.createTempDirectory("graft-scd2feedm").toString
    val scd2Dir = Files.createTempDirectory("graft-scd2feedmh").toString
    val up = CowUpsertStream.pipeline(feedDir, buckets = 4,
      compactEvery = 100)
    // per-key strictly increasing ts -> feed change rows ARE the raw log
    def batch(b: Int) = (0 until 6).map { k =>
      (k.toLong, "a", 100L * (b + 1) + k, (b * 6 + k).toLong,
        ((b + k) % 3).toDouble)
    }
    (0 until 3).foreach(b => up(df2(batch(b)), b.toLong))
    CowUpsertStream.delete(spark, feedDir,
      Seq((1L, "a")).toDF("user_id", "event_type"),
      tombstoneTsUs = Some(10000L))
    assert(Scd2Stream.fromFeed(spark, feedDir, scd2Dir, tier = tierCol,
      buckets = 4, latenessUs = 1000000L, attrType = attrType) > 0)
    val raw = (0 until 3).flatMap(batch)
    val lastId = raw.groupBy(_._1).view.mapValues(_.maxBy(_._3)._4).toMap
    val truthRows = raw.map(e =>
        (e._1, e._2, e._3, e._4, Some(e._5), false)) :+
      ((1L, "a", 10000L, lastId(1L), None: Option[Double], true))
    val truthLog = truthRows
      .toDF("user_id", "event_type", "ts_us", "event_id", "value",
        "is_delete")
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"), tierCol.as("tier"), col("is_delete"))
    def vset(d: org.apache.spark.sql.DataFrame) = d
      .select(col("user_id"), col("tier.a"), col("tier.b"),
        col("valid_from_us"), col("valid_to_us"), col("version"),
        col("is_current"))
      .collect().map(_.toSeq).toSet
    assert(vset(Scd2Stream.versions(spark, scd2Dir, attrType)) ==
      vset(Scd2Stream.scd2OfLog(truthLog)),
      "feed-fed struct history != one-shot of the equivalent struct log")
    // idempotent refold with the same declared type
    assert(Scd2Stream.fromFeed(spark, feedDir, scd2Dir, tier = tierCol,
      buckets = 4, latenessUs = 1000000L, attrType = attrType) == 0L)
  }

  private def df2(s: Seq[(Long, String, Long, Long, Double)]) =
    s.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  test("per-batch write IO is proportional to touched buckets") {
    val dir = Files.createTempDirectory("graft-scd2io").toString
    val fn = Scd2Stream.pipeline(dir, buckets = 32, latenessUs = 100000L,
      compactEvery = 100)
    // seed: 64 keys across the bucket space
    fn(df((0 until 64).map(k =>
      (k.toLong, "a", 100L, k.toLong, Some(1L), false))), 0L)
    // one-key batch: generation 1 must own very few buckets
    fn(df(Seq((1L, "a", 200L, 100L, Some(2L), false))), 1L)
    val owned = CowStore.bucketsIn(spark, dir, 1L)
    assert(owned.size <= 2,
      s"1-key batch rewrote ${owned.size} of 32 buckets")
    assert(versionRows(Scd2Stream.versions(spark, dir)) ==
      versionRows(Scd2Stream.scd2OfLog(df(
        (0 until 64).map(k =>
          (k.toLong, "a", 100L, k.toLong, Some(1L), false)) :+
          (1L, "a", 200L, 100L, Some(2L), false)))))
  }

  test("keyPredicate prunes below the window exactly: pushed == filtered-after; non-key predicates refuse") {
    val dir = Files.createTempDirectory("graft-scd2kp").toString
    val all = corpus(37)
    val fn = Scd2Stream.pipeline(dir, buckets = 8,
      latenessUs = all.map(_._3).max + 1, compactEvery = 100)
    fn(df(all), 0L)
    val pred = col("user_id").between(3L, 7L)
    val pushed = versionRows(
      Scd2Stream.versions(spark, dir, keyPredicate = Some(pred)))
    val after = versionRows(Scd2Stream.versions(spark, dir).where(pred))
    assert(pushed == after && pushed.nonEmpty,
      "pushed key predicate must equal the filtered-after read")
    // asOf serves the pruned band identically
    val t = all.map(_._3).max / 2
    assert(Scd2Stream.asOf(spark, dir, t, keyPredicate = Some(pred))
        .collect().map(_.toSeq).toSet ==
      Scd2Stream.asOf(spark, dir, t).where(pred)
        .collect().map(_.toSeq).toSet)
    // a predicate below the window over NON-key columns would
    // fabricate change points — refuse at declaration
    assert(intercept[IllegalArgumentException] {
      Scd2Stream.versions(spark, dir,
        keyPredicate = Some(col("tier") === 1L))
    }.getMessage.contains("entity-key columns"))
  }

  test("raw changelog mode: an intra-batch A->B->A round-trip yields three versions off the feed; store mode yields one") {
    def history(raw: Boolean): Seq[(Option[Long], Long, Option[Long])] = {
      val feedDir = Files.createTempDirectory(
        s"graft-scd2raw$raw-feed").toString
      val fn = CowUpsertStream.pipeline(feedDir, buckets = 4,
        rawChangelog = raw)
      fn(Seq((1L, "t", 10L, 0L, 1.0), (1L, "t", 20L, 1L, 2.0),
          (1L, "t", 30L, 2L, 1.0))
        .toDF("user_id", "event_type", "ts_us", "event_id", "value"), 0L)
      val scd2Dir = Files.createTempDirectory(
        s"graft-scd2raw$raw").toString
      Scd2Stream.fromFeed(spark, feedDir, scd2Dir)
      Scd2Stream.versions(spark, scd2Dir).orderBy("version").collect()
        .map(r => (if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    }
    // store-granular: the feed carries only the batch winner, so the
    // A->B->A round-trip collapses to one version (the argmax state)
    assert(history(raw = false) ==
      Seq((Some(1L), 30L, None)),
      "store-mode history must be the single argmax version (at the " +
        "winner's ts)")
    // raw: every intermediate tier is a version — raw-exact history
    // off the feed
    assert(history(raw = true) == Seq(
      (Some(1L), 10L, Some(20L)),
      (Some(2L), 20L, Some(30L)),
      (Some(1L), 30L, None)),
      "raw-mode history must carry all three transitions")
  }

  test("declared entity keys: 1- and 3-column keys stream == one-shot; re-keying refuses; dwell shares by a declared key") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val all = corpus(23)
    val lat = all.map(_._3).max + 1
    val rnd = new Random(29)
    val slices = {
      val tagged = all.map(e => (rnd.nextInt(3), e))
      (0 until 3).map(b => tagged.filter(_._1 == b).map(_._2))
    }
    def rows(d: DataFrame): Set[Seq[Any]] =
      d.collect().map(_.toSeq).toSet

    // ---- 1-column key: "my entity key is device_id"
    val k1 = StructType(Seq(StructField("device_id", LongType)))
    def log1(s: Seq[Ev]): DataFrame =
      df(s).withColumnRenamed("user_id", "device_id").drop("event_type")
    val d1 = Files.createTempDirectory("graft-scd2k1").toString
    val fn1 = Scd2Stream.pipeline(d1, buckets = 4, latenessUs = lat,
      compactEvery = 100, keys = k1)
    slices.zipWithIndex.foreach { case (s, i) => fn1(log1(s), i.toLong) }
    assert(rows(Scd2Stream.versions(spark, d1, keys = k1)) ==
      rows(Scd2Stream.scd2OfLog(log1(all), k1)),
      "1-column-key stream != one-shot")

    // ---- 3-column key (account, type, region): the real-warehouse ask
    val k3 = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("region", StringType)))
    def log3(s: Seq[Ev]): DataFrame = df(s)
      .withColumn("region", concat(lit("r"), col("event_id") % 3))
    val d3 = Files.createTempDirectory("graft-scd2k3").toString
    val fn3 = Scd2Stream.pipeline(d3, buckets = 8, latenessUs = lat,
      compactEvery = 100, keys = k3)
    slices.zipWithIndex.foreach { case (s, i) => fn3(log3(s), i.toLong) }
    assert(rows(Scd2Stream.versions(spark, d3, keys = k3)) ==
      rows(Scd2Stream.scd2OfLog(log3(all), k3)),
      "3-column-key stream != one-shot")
    // asOf serves the declared key columns
    val tMid = all.map(_._3).max / 2
    assert(Scd2Stream.asOf(spark, d3, tMid, keys = k3)
      .columns.take(3).toSeq == Seq("user_id", "event_type", "region"))
    // dwell shares by any DECLARED key column; an undeclared one refuses
    assert(Scd2Stream.dwell(spark, d3, keys = k3, shareBy = "region")
      .columns.head == "region")
    assert(intercept[IllegalArgumentException] {
      Scd2Stream.dwell(spark, d3, keys = k3, shareBy = "device_id")
    }.getMessage.contains("declared key"))

    // ---- the committed key contract: a reader with different keys
    // refuses instead of silently null-parsing (parquet resolves by
    // name)
    assert(intercept[IllegalStateException] {
      Scd2Stream.versions(spark, d1) // default (user_id, event_type)
    }.getMessage.contains("re-key"))
    assert(intercept[IllegalStateException] {
      Scd2Stream.versions(spark, d3, keys = k1)
    }.getMessage.contains("re-key"))
    // and a mismatched pipeline refuses at its first batch
    val fnBad = Scd2Stream.pipeline(d1, buckets = 4, latenessUs = lat,
      compactEvery = 100) // default keys against the device_id store
    assert(intercept[IllegalStateException] {
      fnBad(df(all.take(1)), 99L)
    }.getMessage.contains("re-key"))
  }
}
