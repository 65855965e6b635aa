package graft.tools

import org.apache.spark.sql.SparkSession

import graft.schema.SensorReading
import graft.streaming.{SensorPipeline, StatefulOps}

/** End-to-end live demo of the Kappa ingest path (SURVEY.md §3.1):
  * rate-source sensor synthesis → JSON wire encode/decode → watermarked
  * dedup → stateful threshold counter, printed to console for a few
  * seconds. Usage: runMain graft.tools.StreamDemo [seconds] [rowsPerSec]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(6)
    val rps = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sensor = SensorPipeline.syntheticSensorStream(spark, rowsPerSecond = rps)
    val overWire = SensorPipeline.parseWire(SensorPipeline.toWire(sensor))
    val deduped = SensorPipeline.dedupStream(overWire)
    val triggers = StatefulOps.thresholdCounter(deduped.as[SensorReading], threshold = 25)

    val q = triggers.writeStream.format("console")
      .option("truncate", "false").outputMode("append").start()
    q.awaitTermination(seconds * 1000L)
    q.stop()
    spark.stop()
  }
}
