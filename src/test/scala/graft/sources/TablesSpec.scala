package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkSpec

/** The events loader's layout normalization (FIXTURES.md: the driver
  * has shipped the `ts` column as both TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS)/NTZ across rounds) and its session-conf hygiene:
  * the `nanosAsLong` toggle persists ONLY when the nanos layout makes
  * it load-bearing at execution time; on any other layout the caller's
  * session state is restored.
  */
class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"
  private val dir = "/root/testdata/sf0.001"

  test("events: one logical schema over either physical layout, ts_ns ≡ ts") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    assert(df.count() > 0)
    assert(df.where(expr("ts_ns != unix_micros(ts) * 1000")).count() == 0,
      "ts_ns and ts must describe the same instant at µs precision")
  }

  test("events: the nanosAsLong session toggle does not leak when inert") {
    spark.conf.unset(key)
    val df = Tables.events(spark, dir)
    df.count()
    spark.conf.getOption(key) match {
      case Some(_) =>
        // NANOS layout: the conf is load-bearing for every derived plan
        // (the parquet reader consults it at execution time) and
        // persists by design — the loader's documented one exception.
        assert(df.schema("ts_ns").dataType == LongType)
      case None =>
        // MICROS/NTZ layout (the current testdata): the conf was inert
        // and must have been restored — and a pre-existing caller value
        // survives a load verbatim.
        spark.conf.set(key, "false")
        Tables.events(spark, dir).count()
        assert(spark.conf.get(key) == "false",
          "caller's session value must be restored, not clobbered")
        spark.conf.unset(key)
    }
  }
}
