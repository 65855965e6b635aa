package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hull-replacement law makes streamed sessionization EXACT: after
  * any prefix of batches, the committed session intervals equal the
  * gaps-and-islands sessions over the union of all events delivered so
  * far — for ANY slicing and arrival order, including out-of-order
  * events that land inside a committed session (n/mass fold, bounds
  * unchanged) and bridging events that retroactively MERGE two
  * committed sessions into one. An independent driver-side fold is the
  * reference (not the operator's own islands pass). Plus the family
  * contract: replay skip, stale refuse, gap-signature refuse, null
  * guard, fresh-state read, engine leg.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L // µs

  private type Ev = (Long, Long, Double) // user_id, ts_us, value

  /** Independent reference: per user, sort event timestamps and fold —
    * split when the diff to the previous event is >= gap. Mass in
    * integer micro-units (HALF_UP per event, matching the operator's
    * per-event quantization).
    */
  private def reference(events: Seq[Ev], gap: Long)
      : Set[(Long, Long, Long, Long, Long)] = {
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(_._2)
      val sessions = sorted.tail.foldLeft(
        List(List(sorted.head))) { (acc, e) =>
        if (e._2 - acc.head.head._2 >= gap) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }
      sessions.map { s =>
        val ts = s.map(_._2)
        // HALF_UP away from zero, matching Spark's round() (and NOT
        // math.round, which rounds negative halves toward +∞).
        val mass = s.map(e => BigDecimal(e._3 * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
        (u, ts.min, ts.max, s.size.toLong, mass)
      }
    }.toSet
  }

  private def committed(dir: String): Set[(Long, Long, Long, Long, Long)] =
    SessionStream.sessions(spark, dir, Gap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  private def df(s: Seq[Ev]) = s.toDF("user_id", "ts_us", "value")

  // 25 users with clustered activity: bursts of 3-8 events < gap
  // apart, bursts separated by >= gap idle. Values carry 6-decimal
  // fractions so the micro-mass actually exercises quantization.
  private def corpus(seed: Int): Seq[Ev] = {
    val rnd = new Random(seed)
    for {
      u <- 0L until 25L
      burst <- 0 until (1 + rnd.nextInt(4))
      base = burst * 10000L + rnd.nextInt(3000)
      i <- 0 until (3 + rnd.nextInt(6))
    } yield (u, base + i * (50L + rnd.nextInt(900)),
      rnd.nextDouble() * 10 - 5)
  }

  private def slice(evs: Seq[Ev], n: Int, seed: Int): Seq[Seq[Ev]] = {
    val rnd = new Random(seed)
    val tagged = evs.map(e => (rnd.nextInt(n), e))
    (0 until n).map(b => tagged.filter(_._1 == b).map(_._2))
      .filter(_.nonEmpty)
  }

  test("stream == independent fold after EVERY batch, for any seeded slicing") {
    for (seed <- Seq(1, 7)) {
      val dir = Files.createTempDirectory(s"graft-sess$seed").toString
      val fn = SessionStream.pipeline(dir, Gap)
      val evs = corpus(seed)
      val slices = slice(evs, 4, seed + 100)
      slices.zipWithIndex.foreach { case (s, i) =>
        fn(df(s), i.toLong)
        val seen = slices.take(i + 1).flatten
        assert(committed(dir) == reference(seen, Gap),
          s"seed=$seed after batch $i")
      }
    }
  }

  test("a late bridging event MERGES two committed sessions; a nested event folds without moving bounds") {
    val dir = Files.createTempDirectory("graft-sessbridge").toString
    val fn = SessionStream.pipeline(dir, Gap)
    // Batch 0: user 1 has two sessions [0,500] and [3000,3500]
    // (gap 2500 >= 1000), user 2 one session [100,200].
    val b0: Seq[Ev] = Seq((1L, 0L, 1.0), (1L, 500L, 1.0),
      (1L, 3000L, 2.0), (1L, 3500L, 2.0), (2L, 100L, 0.5), (2L, 200L, 0.5))
    fn(df(b0), 0L)
    assert(committed(dir) == Set(
      (1L, 0L, 500L, 2L, 2000000L), (1L, 3000L, 3500L, 2L, 4000000L),
      (2L, 100L, 200L, 2L, 1000000L)))
    // Batch 1: the bridge (1400, 2200 — each step < gap, so user 1's
    // two sessions merge into one) plus an event at 150, INSIDE user
    // 2's committed [100,200]: bounds must not move, n/mass must fold.
    val b1: Seq[Ev] = Seq((1L, 1400L, 0.25), (1L, 2200L, 0.25),
      (2L, 150L, 0.125))
    fn(df(b1), 1L)
    assert(committed(dir) == Set(
      (1L, 0L, 3500L, 6L, 6500000L),
      (2L, 100L, 200L, 3L, 1125000L)))
  }

  test("userStats read: counts, longest session, HALF_UP mean idle gap") {
    val dir = Files.createTempDirectory("graft-sessstats").toString
    val fn = SessionStream.pipeline(dir, Gap)
    // user 7: sessions [0,300], [2000,2100], [5001,5001] →
    // idle gaps 1700 and 2901 → mean HALF_UP((1700+2901)/2) = 2301
    // (4601/2 = 2300.5 → 2301). user 8: one session (null idle).
    val evs: Seq[Ev] = Seq((7L, 0L, 0.0), (7L, 300L, 0.0),
      (7L, 2000L, 0.0), (7L, 2100L, 0.0), (7L, 5001L, 0.0),
      (8L, 42L, 0.0))
    fn(df(evs), 0L)
    val rows = SessionStream.userStats(spark, dir, Gap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4))).toSeq
    assert(rows == Seq((7L, 3L, 5L, 300L, 2301L), (8L, 1L, 1L, 0L, null)))
  }

  test("replay skips; stale and gap-mismatch refuse; fresh state reads empty; null rows drop") {
    val dir = Files.createTempDirectory("graft-sessguards").toString
    assert(SessionStream.intervals(spark, dir).count() == 0L)
    val fn = SessionStream.pipeline(dir, Gap)
    val evs = corpus(3)
    val slices = slice(evs, 3, 5)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val metaBefore = SessionStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(committed(dir) == before)
    assert(SessionStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    intercept[IllegalStateException] { // different gap cannot merge
      SessionStream.pipeline(dir, Gap * 2)(df(slices.head), 99L)
    }
    intercept[IllegalStateException] { // read at the wrong gap refuses
      SessionStream.sessions(spark, dir, Gap + 1).collect()
    }
    // Null user/ts rows drop before the merge; a null value folds as 0.
    val withNulls = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (null, 10L, 1.0), (9L, null, 1.0), (9L, 77L, null))
      .toDF("user_id", "ts_us", "value")
    fn(withNulls, slices.size.toLong)
    val after = committed(dir)
    assert(after == before + ((9L, 77L, 77L, 1L, 0L)))
  }

  test("under the streaming engine: MemoryStream batches converge to the fold") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-sessengine").toString
    val fn = SessionStream.pipeline(dir, Gap)
    val mem = MemoryStream[Ev]
    val q = mem.toDF().toDF("user_id", "ts_us", "value")
      .writeStream.foreachBatch(fn).start()
    val slices = slice(corpus(11), 3, 13)
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(committed(dir) == reference(slices.flatten, Gap))
  }
}
