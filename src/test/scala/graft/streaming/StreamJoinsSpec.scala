package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine-managed stream-stream join: matches across micro-batches
  * in either arrival order inside the time bound, drops input the
  * watermark has passed, and (outer form) emits null-padded unmatched
  * rows exactly when eviction proves no match can arrive.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000000L // epoch µs
  private def ts(min: Long): Long = base + min * 60000000L

  private def impDf(mem: org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]): DataFrame =
    mem.toDF().toDF("imp_id", "user_id", "imp_us")
      .withColumn("imp_ts", timestamp_micros(col("imp_us"))).drop("imp_us")

  private def clkDf(mem: org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]): DataFrame =
    mem.toDF().toDF("click_id", "c_imp_id", "click_us")
      .withColumn("click_ts", timestamp_micros(col("click_us")))
      .drop("click_us")

  test("inner join: in-window clicks attribute across batches; out-of-window never; below-watermark input drops") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val impMem = MemoryStream[(Long, Long, Long)]
    val clkMem = MemoryStream[(Long, Long, Long)]
    val joined = StreamJoins.impressionClickJoin(
      impDf(impMem), clkDf(clkMem))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_inner").outputMode("append").start()
    try {
      // batch 1: imp 1 clicked in-window (+2 min); imp 2's click lands
      // +19 min after it — outside the 10-minute bound, never a match.
      impMem.addData((1L, 100L, ts(0)), (2L, 200L, ts(1)))
      clkMem.addData((10L, 1L, ts(2)), (11L, 2L, ts(20)))
      q.processAllAvailable()
      val r1 = spark.table("ssj_inner")
        .select("imp_id", "click_id", "delay_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(r1 == Set((1L, 10L, 2L * 60000000L)))
      // advance BOTH sides: the engine's GLOBAL watermark is the MIN
      // of the two stream watermarks (multipleWatermarkPolicy=min) —
      // one-sided progress drops nothing, which is why a quiet side
      // holds the whole join's state hostage.
      impMem.addData((5L, 500L, ts(30)))
      clkMem.addData((14L, 5L, ts(30)))
      q.processAllAvailable()
      // batch 3: a click for imp 2 at +6 min WOULD be in-window, but
      // it is below the global watermark (30-5=25 min) — dropped, the
      // attribution stays lost (the lateness bound is a contract, not
      // a hint).
      clkMem.addData((12L, 2L, ts(6)))
      q.processAllAvailable()
      // an extra trigger so any (incorrect) buffered match would surface
      clkMem.addData((13L, 1L, ts(31)))
      q.processAllAvailable()
      val r2 = spark.table("ssj_inner").select("click_id").collect()
        .map(_.getLong(0)).toSet
      assert(r2 == Set(10L, 14L), s"late click must drop, got $r2")
    } finally q.stop()
  }

  test("outer join: unmatched impressions emit null-padded EXACTLY at the eviction proof point") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val impMem = MemoryStream[(Long, Long, Long)]
    val clkMem = MemoryStream[(Long, Long, Long)]
    val joined = StreamJoins.impressionClickOuter(
      impDf(impMem), clkDf(clkMem))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      def rows(): Set[(Long, Option[Long])] =
        spark.table("ssj_outer").select("imp_id", "click_id").collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // imp 1 converts; imp 2 never does
      impMem.addData((1L, 100L, ts(0)), (2L, 200L, ts(0)))
      clkMem.addData((10L, 1L, ts(3)))
      q.processAllAvailable()
      // the match emits immediately; imp 2 must NOT be emitted yet —
      // a click could still arrive until watermark > 0+10+5 min
      assert(rows() == Set((1L, Some(10L))))
      // advance both watermarks far past imp 2's eviction point
      impMem.addData((3L, 300L, ts(60)))
      clkMem.addData((99L, 3L, ts(60)))
      q.processAllAvailable()
      // outer results surface on the trigger AFTER the watermark move
      impMem.addData((4L, 400L, ts(90)))
      clkMem.addData((98L, 4L, ts(90)))
      q.processAllAvailable()
      q.processAllAvailable()
      val r = rows()
      assert(r.contains((2L, None)),
        s"unmatched impression must emit null-padded after eviction: $r")
      assert(r.contains((1L, Some(10L))) && r.contains((3L, Some(99L))))
      assert(!r.contains((2L, Some(10L))))
    } finally q.stop()
  }
}
