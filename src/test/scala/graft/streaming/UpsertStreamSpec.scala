package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** Argmax idempotence makes the streamed latest-wins store EXACT and
  * redelivery-immune: after any prefix of batches the committed
  * current rows equal the batch argmax over every row ever delivered,
  * for any slicing — including late-but-older updates (never
  * displace) and late-but-newer ones (always displace). Plus the
  * family contract.
  */
class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Up = (Long, String, Long, Long, Double)

  /** Driver reference: argmax per (user, type) under
    * (ts_us DESC, event_id DESC).
    */
  private def reference(ups: Seq[Up]): Set[Up] =
    ups.groupBy(u => (u._1, u._2)).values
      .map(_.maxBy(u => (u._3, u._4))).toSet

  private def committed(dir: String): Set[Up] =
    UpsertStream.latest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

  private def df(s: Seq[Up]) =
    s.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  // 30 users × 3 types, several versions each; event_id unique so the
  // (ts, event_id) order is total.
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

  test("stream == batch argmax after EVERY batch, any slicing") {
    for (seed <- Seq(1, 8)) {
      val dir = Files.createTempDirectory(s"graft-ups$seed").toString
      val fn = UpsertStream.pipeline(dir)
      val slices = slice(corpus(seed), 4, seed + 30)
      slices.zipWithIndex.foreach { case (s, i) =>
        fn(df(s), i.toLong)
        assert(committed(dir) == reference(slices.take(i + 1).flatten),
          s"seed=$seed after batch $i")
      }
    }
  }

  test("a late OLDER update never displaces; a late NEWER one always does; same-ts ties break on event_id") {
    val dir = Files.createTempDirectory("graft-upslate").toString
    val fn = UpsertStream.pipeline(dir)
    fn(df(Seq((1L, "a", 100L, 5L, 1.0), (2L, "a", 50L, 6L, 2.0))), 0L)
    // user 1: older ts loses; user 2: newer ts wins; user 2 then a
    // same-ts row with higher event_id wins the tie.
    fn(df(Seq((1L, "a", 90L, 7L, 9.0), (2L, "a", 60L, 8L, 3.0))), 1L)
    fn(df(Seq((2L, "a", 60L, 9L, 4.0))), 2L)
    assert(committed(dir) == Set(
      (1L, "a", 100L, 5L, 1.0), (2L, "a", 60L, 9L, 4.0)))
  }

  test("redelivery in a NEW batch is a no-op (argmax idempotence) — state AND total unchanged") {
    val dir = Files.createTempDirectory("graft-upsre").toString
    val fn = UpsertStream.pipeline(dir)
    val slices = slice(corpus(3), 3, 4)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val totalBefore = UpsertStream.readMeta(spark, dir).map(_._1)
    fn(df(slices.head ++ slices.last), slices.size.toLong)
    assert(committed(dir) == before)
    assert(UpsertStream.readMeta(spark, dir).map(_._1) == totalBefore)
  }

  test("replay skips; stale refuses; null key/order rows drop; fresh state reads empty") {
    val dir = Files.createTempDirectory("graft-upsguards").toString
    assert(UpsertStream.latest(spark, dir).count() == 0L)
    val fn = UpsertStream.pipeline(dir)
    val slices = slice(corpus(5), 3, 6)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = committed(dir)
    val metaBefore = UpsertStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(committed(dir) == before)
    assert(UpsertStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    val withNulls = Seq[(java.lang.Long, String, java.lang.Long,
        java.lang.Long, java.lang.Double)](
      (null, "a", 1L, 1L, 1.0), (1L, null, 1L, 2L, 1.0),
      (1L, "a", null, 3L, 1.0), (1L, "a", 1L, null, 1.0))
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
    fn(withNulls, slices.size.toLong) // all rows drop; state unchanged
    assert(committed(dir) == before)
  }

  test("under the streaming engine: MemoryStream batches converge to the batch argmax") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-upsengine").toString
    val fn = UpsertStream.pipeline(dir)
    val mem = MemoryStream[Up]
    val q = mem.toDF()
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
      .writeStream.foreachBatch(fn).start()
    val slices = slice(corpus(10), 3, 12)
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(committed(dir) == reference(slices.flatten))
  }
}
