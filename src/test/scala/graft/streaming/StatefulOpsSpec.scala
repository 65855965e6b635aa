package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.schema.SensorReading

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def reading(count: Long): SensorReading =
    SensorReading("raspberrypi", Timestamp.valueOf("2022-07-14 15:00:01"),
      50.0, 30.0, 1012.0, 0.0, 0.0, 0.0, count)

  test("thresholdCounter: triggers at threshold, resets, persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = StatefulOps.thresholdCounter(mem.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("cnt_out").outputMode("append").start()
    try {
      mem.addData((1L to 2L).map(reading): _*) // 2 rows: below threshold
      q.processAllAvailable()
      assert(spark.table("cnt_out").count() == 0)
      mem.addData((3L to 7L).map(reading): _*) // +5 → total 7: one trigger at 3, reset, count=4→ one more at...
      q.processAllAvailable()
      val totals = spark.table("cnt_out").collect().map(_.getAs[Long]("total")).toSeq
      // state 2 + 5 rows: hits 3 (trigger, reset), then 4 more rows → hits 3 again (trigger), 1 left
      assert(totals == Seq(3L, 3L), s"got $totals")
    } finally q.stop()
  }

  test("countAnomalies: detects gaps and QoS1 duplicate redeliveries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = StatefulOps.countAnomalies(mem.toDS())
      .writeStream.format("memory").queryName("anom_out").outputMode("append").start()
    try {
      mem.addData(reading(1), reading(2), reading(4)) // gap: 3 skipped
      q.processAllAvailable()
      mem.addData(reading(4), reading(5))             // dup: 4 redelivered
      q.processAllAvailable()
      val anoms = spark.table("anom_out").collect()
        .map(r => (r.getAs[String]("kind"), r.getAs[Long]("expected"), r.getAs[Long]("got")))
        .sortBy(_.toString)
      assert(anoms.toSeq == Seq(("dup", 5L, 4L), ("gap", 3L, 4L)), s"got ${anoms.toSeq}")
    } finally q.stop()
  }
}
