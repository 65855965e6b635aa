package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.operators.SnapshotDiff

/** The copy-on-write store must be EXACTLY UpsertStream — same argmax,
  * same guards — while writing only touched buckets per batch, and
  * its changelog must be EXACTLY the snapshot diff of consecutive
  * generations (certified against the general SnapshotDiff operator).
  */
class CowUpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Up = (Long, String, Long, Long, Double)

  private def reference(ups: Seq[Up]): Set[Up] =
    ups.groupBy(u => (u._1, u._2)).values
      .map(_.maxBy(u => (u._3, u._4))).toSet

  private def committed(dir: String): Set[Up] =
    CowUpsertStream.latest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

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

  test("stream == batch argmax after EVERY batch, across compaction boundaries") {
    for (seed <- Seq(1, 8)) {
      val dir = Files.createTempDirectory(s"graft-cow$seed").toString
      // compactEvery=3 so a 6-slice run crosses two compactions
      val fn = CowUpsertStream.pipeline(dir, buckets = 8, compactEvery = 3)
      val slices = slice(corpus(seed), 6, seed + 30)
      slices.zipWithIndex.foreach { case (s, i) =>
        fn(df(s), i.toLong)
        val delivered = slices.take(i + 1).flatten
        assert(committed(dir) == reference(delivered),
          s"seed=$seed after batch $i")
        assert(CowUpsertStream.readMeta(spark, dir).map(_._1)
          .contains(reference(delivered).size.toLong),
          s"seed=$seed total after batch $i")
      }
    }
  }

  test("changelog(g) == SnapshotDiff.diff(latestAt(g-1), latestAt(g)) for every generation") {
    val dir = Files.createTempDirectory("graft-cowcdc").toString
    // high compactEvery: every generation stays readable for the diff
    val fn = CowUpsertStream.pipeline(dir, buckets = 8, compactEvery = 100)
    val slices = slice(corpus(3), 5, 4)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val emptySnap = df(Seq.empty[Up])
    val all = CowUpsertStream.changes(spark, dir)
    (0 until slices.size).foreach { g =>
      val before =
        if (g == 0) emptySnap
        else CowUpsertStream.latestAt(spark, dir, g - 1L)
      val after = CowUpsertStream.latestAt(spark, dir, g.toLong)
      val expect = SnapshotDiff.diff(before, after,
          Seq("user_id", "event_type"))
        .collect().map(_.toSeq).toSet
      val got = all.where(col("gen") === g.toLong)
        .select(col("user_id"), col("event_type"), col("op"),
          col("old_ts_us"), col("old_event_id"), col("old_value"),
          col("ts_us"), col("event_id"), col("value"))
        .collect().map(_.toSeq).toSet
      assert(got == expect, s"changelog of generation $g")
    }
  }

  test("per-batch write IO is proportional to touched buckets; compaction rewrites all and drops history") {
    val dir = Files.createTempDirectory("graft-cowio").toString
    val fn = CowUpsertStream.pipeline(dir, buckets = 8, compactEvery = 3)
    def dataBuckets(gen: Long): Seq[Int] = {
      val hfs = GenStore.fs(spark, dir)
      hfs.listStatus(new Path(GenStore.dir(dir, gen))).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toInt).filter(_ >= 0).sorted
    }
    // batch 0: enough keys to populate several buckets
    val wide = (0 until 64).map(i =>
      (i.toLong, "t", 100L, i.toLong, i.toDouble))
    fn(df(wide), 0L)
    val live = dataBuckets(0L)
    assert(live.size > 1)
    // batch 1: ONE key -> gen-1 holds exactly that key's bucket
    fn(df(Seq((5L, "t", 200L, 1000L, 9.9))), 1L)
    assert(dataBuckets(1L).size == 1)
    assert(committed(dir) == reference(wide :+ (5L, "t", 200L, 1000L, 9.9)))
    // untouched buckets still resolve from gen-0
    assert(GenStore.committed(spark, dir) == Seq(0L, 1L))
    // batch 2 lands gen-2; batch 3 lands gen-3 = a compaction: all live
    // buckets rewritten, predecessors dropped, time travel refuses below
    fn(df(Seq((6L, "t", 300L, 1001L, 1.1))), 2L)
    fn(df(Seq((7L, "t", 400L, 1002L, 2.2))), 3L)
    assert(GenStore.committed(spark, dir) == Seq(3L))
    assert(dataBuckets(3L) == live)
    intercept[IllegalArgumentException] {
      CowUpsertStream.latestAt(spark, dir, 1L)
    }
    // the change feed survives compaction: one dir per generation
    assert(CowUpsertStream.changes(spark, dir)
      .select("gen").distinct().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("redelivered current rows are SILENT in the changelog; losers emit nothing") {
    val dir = Files.createTempDirectory("graft-cowsil").toString
    val fn = CowUpsertStream.pipeline(dir, buckets = 4)
    fn(df(Seq((1L, "a", 100L, 5L, 1.0), (2L, "a", 50L, 6L, 2.0))), 0L)
    // redelivery of user 1's current row + a LOSING older update for 2
    fn(df(Seq((1L, "a", 100L, 5L, 1.0), (2L, "a", 40L, 4L, 8.0))), 1L)
    val g1 = CowUpsertStream.changes(spark, dir)
      .where(col("gen") === 1L)
    assert(g1.count() == 0L)
    assert(committed(dir) == Set(
      (1L, "a", 100L, 5L, 1.0), (2L, "a", 50L, 6L, 2.0)))
    // total unchanged by the silent batch
    assert(CowUpsertStream.readMeta(spark, dir).map(_._1).contains(2L))
  }

  test("replay skips without duplicating the feed; stale refuses; bucket-count change refuses; nulls drop; fresh reads empty") {
    val dir = Files.createTempDirectory("graft-cowguard").toString
    assert(CowUpsertStream.latest(spark, dir).count() == 0L)
    assert(CowUpsertStream.changes(spark, dir).count() == 0L)
    val fn = CowUpsertStream.pipeline(dir, buckets = 8)
    val slices = slice(corpus(5), 3, 6)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val feedBefore = CowUpsertStream.changes(spark, dir).count()
    var replayTotal = -1L
    val fnCb = CowUpsertStream.pipeline(dir, buckets = 8,
      onBatch = (_, t) => replayTotal = t)
    fnCb(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(committed(dir) == before)
    assert(CowUpsertStream.changes(spark, dir).count() == feedBefore)
    assert(replayTotal == before.size.toLong)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    intercept[IllegalStateException] { // layout change
      CowUpsertStream.pipeline(dir, buckets = 16)(
        df(slices.head), slices.size.toLong)
    }
    val withNulls = Seq[(java.lang.Long, String, java.lang.Long,
        java.lang.Long, java.lang.Double)](
      (null, "a", 1L, 1L, 1.0), (1L, null, 1L, 2L, 1.0),
      (1L, "a", null, 3L, 1.0), (1L, "a", 1L, null, 1.0))
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
    fn(withNulls, slices.size.toLong) // all rows drop; state unchanged
    assert(committed(dir) == before)
  }

  test("delete: bucket-cost removal, emptied buckets stay dead, the feed carries before-images, diff certifies the generation") {
    val dir = Files.createTempDirectory("graft-cowdel").toString
    val fn = CowUpsertStream.pipeline(dir, buckets = 4, compactEvery = 100)
    val rows = (0 until 32).map(i =>
      (i.toLong, "t", 100L, i.toLong, i.toDouble))
    fn(df(rows), 0L)
    // delete half the keys — including, for SOME bucket, every key it
    // holds (4 buckets, 16 deleted keys: pigeonhole makes emptying
    // likely; we verify resurrection-safety via exact state equality
    // regardless)
    val doomed = rows.filter(_._1 % 2 == 0).map(r => (r._1, r._2))
    val nDel = CowUpsertStream.delete(spark, dir,
      doomed.toDF("user_id", "event_type"))
    assert(nDel == 16L)
    val expect = reference(rows.filterNot(_._1 % 2 == 0))
    assert(committed(dir) == expect, "deleted rows must not resurrect")
    assert(CowUpsertStream.readMeta(spark, dir).map(_._1).contains(16L))
    // the feed's delete generation: op=delete, before-images, no after
    val g1 = CowUpsertStream.changes(spark, dir).where(col("gen") === 1L)
    assert(g1.count() == 16L)
    assert(g1.where(col("op") =!= "delete").count() == 0L)
    assert(g1.where(col("ts_us").isNotNull).count() == 0L)
    assert(g1.where(col("old_ts_us").isNull).count() == 0L)
    // SnapshotDiff certifies the delete generation like any other
    val expectDiff = SnapshotDiff.diff(
        CowUpsertStream.latestAt(spark, dir, 0L),
        CowUpsertStream.latestAt(spark, dir, 1L),
        Seq("user_id", "event_type"))
      .collect().map(_.toSeq).toSet
    val gotDiff = g1.select(col("user_id"), col("event_type"), col("op"),
        col("old_ts_us"), col("old_event_id"), col("old_value"),
        col("ts_us"), col("event_id"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(gotDiff == expectDiff)
    // absent keys: no-op, no generation, no feed entry
    assert(CowUpsertStream.delete(spark, dir,
      Seq((999L, "t")).toDF("user_id", "event_type")) == 0L)
    assert(GenStore.committed(spark, dir) == Seq(0L, 1L))
    // a later batch re-inserts a deleted key: clean insert (old gone)
    fn(df(Seq((0L, "t", 200L, 1000L, 9.9))), 1L)
    assert(committed(dir) == expect + ((0L, "t", 200L, 1000L, 9.9)))
    val g2 = CowUpsertStream.changes(spark, dir).where(col("gen") === 2L)
    assert(g2.collect().map(r => (r.getString(2), r.getLong(0))).toSet ==
      Set(("insert", 0L)))
  }

  test("under the streaming engine: MemoryStream batches converge and the feed folds to the state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cowengine").toString
    val fn = CowUpsertStream.pipeline(dir, buckets = 8, compactEvery = 2)
    val mem = MemoryStream[Up]
    val q = mem.toDF()
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
      .writeStream.foreachBatch(fn).start()
    val slices = slice(corpus(10), 3, 12)
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(committed(dir) == reference(slices.flatten))
    // fold law: each key's LAST change row carries the current image
    val folded = CowUpsertStream.changes(spark, dir)
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (_, rs) =>
        val last = rs.maxBy(_.getLong(10)) // gen
        (last.getLong(0), last.getString(1), last.getLong(3),
          last.getLong(4), last.getDouble(5))
      }.toSet
    assert(folded == committed(dir))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("z-ordered compaction: bucket files are (ts, event_id) boxes a 2-d predicate skips; the store stays exact") {
    import org.apache.spark.sql.functions.{input_file_name, lit, max, min}
    val dir = Files.createTempDirectory("graft-cowz").toString
    // one bucket, 16 z-range files: the LayoutSpec box law, measurable
    // at file granularity, on the store's own compaction write
    val fn = CowUpsertStream.pipeline(dir, buckets = 1, compactEvery = 1,
      zOrderOn = Some(ZOrder("ts_us", "event_id", bits = 8,
        rangeFiles = 16)))
    // 96x96 grid of current rows: unique key per cell, ts_us = x,
    // event_id = y (both in [0, 96))
    val grid = for (x <- 0 until 96; y <- 0 until 96)
      yield ((x * 96 + y).toLong, "g", x.toLong, y.toLong, 1.0)
    fn(df(grid), 0L)
    fn(df(Seq((0L, "g", 95L, 95L, 2.0))), 1L) // gen 1: compacting write
    assert(GenStore.committed(spark, dir) == Seq(1L),
      s"unexpected gens ${GenStore.committed(spark, dir)}")
    val gen = GenStore.committed(spark, dir).max
    val bucketDir = s"${GenStore.dir(dir, gen)}/bucket=0"
    val boxes = spark.read.parquet(bucketDir)
      .groupBy(input_file_name())
      .agg(min("ts_us"), max("ts_us"), min("event_id"), max("event_id"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(boxes.length >= 8, s"expected z-range files, got ${boxes.length}")
    // a 24x24 box predicate (6.25% of the key space): intersecting
    // files must be a small fraction, never all of them. The exact
    // count jitters by ±1-2 across runs (repartitionByRange SAMPLES
    // its range bounds), so the pin is the law's direction with
    // headroom, not a knife-edge: a non-boxy layout (insertion order)
    // intersects essentially every file.
    val hit = boxes.count { case (xlo, xhi, ylo, yhi) =>
      xhi >= 30 && xlo <= 53 && yhi >= 30 && ylo <= 53 }
    assert(hit <= boxes.length * 5 / 8,
      s"box touched $hit of ${boxes.length} z files — layout not boxy")
    // and the store is still exactly the batch argmax
    assert(committed(dir) == reference(grid :+
      ((0L, "g", 95L, 95L, 2.0))))
  }

  test("raw changelog: state and totals identical to store mode; the chain telescopes; losers and redeliveries stay silent") {
    val corpusSlices = slice(corpus(71), 3, 73)
    val dirS = Files.createTempDirectory("graft-cowrawS").toString
    val dirR = Files.createTempDirectory("graft-cowrawR").toString
    val fnS = CowUpsertStream.pipeline(dirS, buckets = 4)
    val fnR = CowUpsertStream.pipeline(dirR, buckets = 4,
      rawChangelog = true)
    corpusSlices.zipWithIndex.foreach { case (s, i) =>
      fnS(df(s), i.toLong); fnR(df(s), i.toLong)
    }
    // the state write is mode-independent (the chain's last link IS
    // the argmax), and so is the insert bookkeeping
    assert(committed(dirR) == committed(dirS))
    assert(CowUpsertStream.readMeta(spark, dirR).map(_._1) ==
      CowUpsertStream.readMeta(spark, dirS).map(_._1))
    // the raw chain carries >= the store rows and telescopes: summing
    // (value - old_value) per key over either feed gives the same net
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val net = (dir: String) => CowUpsertStream.changes(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(sum(coalesce(col("value"), lit(0.0)) -
        coalesce(col("old_value"), lit(0.0))).as("net"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(net(dirR) == net(dirS), "raw chain must telescope to store net")
    assert(CowUpsertStream.changes(spark, dirR).count() >=
      CowUpsertStream.changes(spark, dirS).count())
    // a redelivered current row emits nothing in raw mode either
    val before = CowUpsertStream.changes(spark, dirR).count()
    val cur = CowUpsertStream.latest(spark, dirR).limit(1).collect().head
    fnR(df(Seq((cur.getLong(0), cur.getString(1), cur.getLong(2),
      cur.getLong(3), cur.getDouble(4)))), corpusSlices.size.toLong)
    assert(CowUpsertStream.changes(spark, dirR).count() == before)
  }

  test("delete() reclaims orphaned *.staging crash debris at both levels") {
    val dir = Files.createTempDirectory("graft-cowstag").toString
    val fn = CowUpsertStream.pipeline(dir, buckets = 4)
    fn(df(Seq((1L, "t", 100L, 0L, 1.0), (2L, "t", 100L, 1L, 2.0))), 0L)
    // plant the debris a crash between staged write and publish rename
    // leaves: gen-N.staging under the root AND under changes/ — at a
    // gen number the store will NOT reuse (genNumber() ignores
    // non-numeric names, so dropBelow/dropUncommittedAbove never
    // reclaim these)
    val hfs = GenStore.fs(spark, dir)
    val orphans = Seq(s"$dir/gen-7.staging", s"$dir/changes/gen-7.staging")
    orphans.foreach(p => assert(hfs.mkdirs(new Path(p))))
    // Crash debris is old by construction; a FRESH .staging dir is a
    // possibly-in-flight stage and must survive the sweep (round 20's
    // age gate). Age the planted orphans past the gate, plant one
    // fresh decoy next to them.
    orphans.foreach { p =>
      val old = System.currentTimeMillis() -
        CowUpsertStream.stagingSweepAgeMs - 60000L
      hfs.setTimes(new Path(p), old, old)
    }
    val fresh = new Path(s"$dir/gen-8.staging")
    assert(hfs.mkdirs(fresh))
    assert(CowUpsertStream.delete(spark, dir,
      Seq((1L, "t")).toDF("user_id", "event_type")) == 1L)
    orphans.foreach(p =>
      assert(!hfs.exists(new Path(p)), s"orphan $p not swept"))
    assert(hfs.exists(fresh), "fresh (possibly in-flight) stage must survive")
    // the real delete still committed exactly
    assert(committed(dir) == Set((2L, "t", 100L, 1L, 2.0)))
  }
}
