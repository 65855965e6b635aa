package graft.schema

import org.apache.spark.sql.types._

/** The reference's wire record: one flat JSON object per MQTT message,
  * assembled at data-publish/sensor_publish.py:65-75 (orientation map
  * flattened to pitch/roll/yaw at :71-73, counter at :47,83).
  *
  * `timestamp` on the wire is a second-granularity local string
  * (sensor_publish.py:62-63, no timezone); we pin the session to UTC and
  * parse with [[Schemas.TsFormat]].
  */
case class SensorReading(
    client_id: String,
    timestamp: java.sql.Timestamp,
    humidity: Double,
    temperature: Double,
    pressure: Double,
    pitch: Double,
    roll: Double,
    yaw: Double,
    count: Long)

object Schemas {

  /** Wire timestamp format (sensor_publish.py:62-63). */
  val TsFormat = "yyyy-MM-dd HH:mm:ss"

  /** Explicit schema for the wire JSON — schema-on-read, declared not
    * inferred (the reference declares the Athena table manually,
    * README.md:269). `timestamp` arrives as a string and is cast after
    * parse; see [[graft.streaming.SensorPipeline]].
    */
  val sensorWire: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("timestamp", StringType),
    StructField("humidity", DoubleType),
    StructField("temperature", DoubleType),
    StructField("pressure", DoubleType),
    StructField("pitch", DoubleType),
    StructField("roll", DoubleType),
    StructField("yaw", DoubleType),
    StructField("count", LongType)))

  /** Typed schema after timestamp parse (matches [[SensorReading]]). */
  val sensor: StructType = StructType(
    sensorWire.fields.map {
      case StructField("timestamp", _, n, m) => StructField("timestamp", TimestampType, n, m)
      case f => f
    })
}
