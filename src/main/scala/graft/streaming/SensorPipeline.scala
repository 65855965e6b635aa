package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.schema.Schemas

/** Structured-Streaming re-expression of the reference's ingest path
  * (SURVEY.md §3.1): sensor sampling loop → MQTT/IoT-Core → Rule SQL →
  * Kinesis fan-out → Firehose sinks.
  *
  * Mapping (SURVEY.md §2.1/§2.5):
  *  - SRC-1 1 Hz sampling loop      → rate source + deterministic column
  *    synthesis ([[syntheticSensorStream]])
  *  - EXP-3/4 JSON wire format      → [[toWire]] / [[parseWire]] with the
  *    explicit schema (never inferred)
  *  - SRC-4 IoT Rule topic SQL      → [[ruleSelect]] (projection+filter
  *    before any sink — pushdown at ingestion)
  *  - SRC-5 Kinesis two-consumer fan-out → two independent
  *    `StreamingQuery`s over one source, each with its own checkpoint
  *  - SNK-2 hourly index rotation   → parquet sink partitioned by the
  *    hour label ([[hourlyPartitionedWriter]])
  *  - STR-2 at-least-once QoS1      → [[dedupStream]] (watermarked
  *    dropDuplicates on (client_id, count) — effectively-once)
  *  - STR-3/5 hourly windows + late data → [[hourlyWindowedAgg]]
  *    (event-time window + watermark; an upgrade over the reference's
  *    arrival-time bucketing, README.md:110)
  *
  * Scale: all stateful stages key on (client_id …) so state partitions by
  * device; watermarks bound state size; checkpointing gives replay
  * (STR-6). Nothing here collects to the driver.
  */
object SensorPipeline {

  /** SRC-1: deterministic synthetic sensor stream at `rowsPerSecond`
    * (reference samples at 1 Hz, sensor_publish.py:82). Values are
    * smooth functions of the rate-source counter so tests are
    * reproducible; `count` mirrors the per-session publish counter
    * (sensor_publish.py:47,83).
    */
  def syntheticSensorStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond.toLong).load()
      .select(
        lit("raspberrypi").as("client_id"),
        col("timestamp"),
        (lit(55.0) + lit(12.0) * sin(col("value") / 600.0)).as("humidity"),
        (lit(31.0) + lit(6.0) * sin(col("value") / 3600.0)).as("temperature"),
        (lit(1012.0) + lit(3.0) * cos(col("value") / 1800.0)).as("pressure"),
        (pmod(col("value").cast("double"), lit(360.0))).as("pitch"),
        (pmod(col("value").cast("double") * 0.5, lit(360.0))).as("roll"),
        (pmod(col("value").cast("double") * 0.25, lit(360.0))).as("yaw"),
        col("value").as("count"))

  /** EXP-3: encode a sensor record batch/stream to the wire JSON (one
    * object per message, sensor_publish.py:80). Timestamp serialized in
    * the reference's second-granularity format.
    */
  def toWire(sensor: DataFrame): DataFrame =
    sensor.select(to_json(struct(
      col("client_id"),
      date_format(col("timestamp"), Schemas.TsFormat).as("timestamp"),
      col("humidity"), col("temperature"), col("pressure"),
      col("pitch"), col("roll"), col("yaw"), col("count"))).as("value"))

  /** EXP-4: decode wire JSON with the declared schema; parse the
    * second-granularity timestamp string to a typed column (UTC session).
    */
  def parseWire(wire: DataFrame): DataFrame =
    wire.select(from_json(col("value"), Schemas.sensorWire).as("r"))
      .select(
        col("r.client_id").as("client_id"),
        to_timestamp(col("r.timestamp"), Schemas.TsFormat).as("timestamp"),
        col("r.humidity").as("humidity"), col("r.temperature").as("temperature"),
        col("r.pressure").as("pressure"), col("r.pitch").as("pitch"),
        col("r.roll").as("roll"), col("r.yaw").as("yaw"), col("r.count").as("count"))

  /** Pluggable wire-message source (SRC-2/STR-1): anything that yields
    * the one-column JSON wire frame (`value: string`). The reference
    * ingests MQTT → IoT Core → Kinesis (sensor_publish.py:78-81,
    * README.md:46-53); [[KafkaWire]] is that broker leg on Spark's
    * `kafka` connector, [[FileWire]] drives the IDENTICAL downstream
    * pipeline from landed files — the kappa claim (STR-1) as code: swap
    * the source descriptor, keep parse → rule → fan-out unchanged.
    */
  sealed trait WireSource

  /** Broker-backed wire source (`spark-sql-kafka-0-10` connector must be
    * on the classpath; it is not bundled in this build's environment —
    * the wiring is exercised up to Spark's source resolution in tests).
    * `maxOffsetsPerTrigger` is the backpressure knob (STR-7), the
    * broker-side analog of `maxFilesPerTrigger`.
    */
  final case class KafkaWire(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None) extends WireSource

  /** File-backed wire source: JSON-lines files under `dir` (the landed
    * Firehose batches); `maxFilesPerTrigger` bounds per-batch intake.
    */
  final case class FileWire(dir: String,
      maxFilesPerTrigger: Option[Int] = None) extends WireSource

  /** Resolve a [[WireSource]] to the wire frame stream (`value: string`).
    * Kafka's record value is binary — cast, never inferred; the JSON
    * schema is applied downstream by [[parseWire]] (EXP-4's declared
    * schema-on-read, same as every other ingest path).
    */
  def wireStream(spark: SparkSession, src: WireSource): DataFrame = src match {
    case KafkaWire(bs, topic, offsets, maxOffsets) =>
      val reader = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bs)
        .option("subscribe", topic)
        .option("startingOffsets", offsets)
      maxOffsets.foldLeft(reader)((r, n) => r.option("maxOffsetsPerTrigger", n))
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case FileWire(dir, maxFiles) =>
      val reader = spark.readStream.format("text")
      maxFiles.foldLeft(reader)((r, n) => r.option("maxFilesPerTrigger", n.toLong))
        .load(dir)
        .select(col("value"))
  }

  /** Ingest entry point: wire frames from any [[WireSource]], decoded
    * with the declared schema — compose with [[ruleSelect]] and
    * [[fanOut]] for the full reference path.
    */
  def ingest(spark: SparkSession, src: WireSource): DataFrame =
    parseWire(wireStream(spark, src))

  /** EXP-4 robustness: split wire frames into parsed records and a
    * DEAD-LETTER stream of frames the declared schema rejects (garbage
    * bytes, wrong shape, missing identity/time fields). At-least-once
    * transports deliver malformed frames eventually; silently nulling
    * them (from_json's default) corrupts downstream aggregates, and
    * failing the query loses the good frames — the dead-letter split
    * keeps both: parsed records flow on, rejects go to a quarantine
    * sink with the raw frame intact for replay.
    */
  def parseWireOrDeadLetter(wire: DataFrame): (DataFrame, DataFrame) = {
    val tagged = wire.select(col("value"),
      from_json(col("value"), Schemas.sensorWire).as("r"))
    // Validity = the fields every downstream stage keys on: a frame
    // without client_id or timestamp can never join state anyway.
    val ok = col("r").isNotNull && col("r.client_id").isNotNull &&
      to_timestamp(col("r.timestamp"), Schemas.TsFormat).isNotNull
    val parsed = parseWire(tagged.where(ok).select(col("value")))
    val dead = tagged.where(!coalesce(ok, lit(false))).select(col("value"))
    (parsed, dead)
  }

  /** Stream-static enrichment: join the (streaming) readings against a
    * static dimension (device registry/metadata) on `client_id`. The
    * static side is broadcast per micro-batch — no stream state, no
    * watermark needed (unlike stream-stream joins); Spark re-plans the
    * static side each batch, so a refreshed dim parquet is picked up on
    * the next trigger.
    */
  def enrich(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), Seq("client_id"), "left")

  /** SRC-4: the IoT Rule's topic SQL — declarative projection + filter
    * applied before anything is forwarded (README.md:50; canonical rule is
    * `SELECT * FROM 'sensor/data'`, here parameterized).
    */
  def ruleSelect(stream: DataFrame, columns: Seq[String] = Seq("*"),
      predicate: Column = lit(true)): DataFrame =
    stream.where(predicate).selectExpr(columns: _*)

  /** SNK-2: hourly-"index"-rotated sink — parquet partitioned by the hour
    * label (the reference's `sensor-log-YYYY-MM-DD-HH` OpenSearch index
    * rotation, README.md:110). Partition pruning over `hour` replaces
    * index selection.
    */
  def hourlyPartitionedWriter(sensor: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[Row] =
    sensor
      .withColumn("hour", date_format(col("timestamp"), "yyyy-MM-dd-HH"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("hour")
      .trigger(Trigger.AvailableNow())

  /** STR-2/DD-1: at-least-once → effectively-once.
    * `dropDuplicatesWithinWatermark` on the natural message key
    * (client_id, count): QoS1 redeliveries arrive close in time, and this
    * variant EVICTS state once the watermark passes a key's event time.
    * (Plain `dropDuplicates` without the event-time column in the keys
    * never evicts — unbounded state on a long-running stream.)
    */
  def dedupStream(sensor: DataFrame, watermark: String = "10 minutes"): DataFrame =
    sensor
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("client_id", "count")

  /** STR-3/STR-5 + AGG-1: event-time tumbling 1-hour window with a
    * watermark — the streaming form of the hourly-average chart query
    * (README.md:134-150). Late rows beyond the watermark are dropped
    * (documented upgrade: the reference buckets on arrival time).
    */
  def hourlyWindowedAgg(sensor: DataFrame, watermark: String = "10 minutes"): DataFrame =
    sensor
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), "1 hour"), col("client_id"))
      .agg(
        avg("temperature").as("avg_temperature"),
        avg("humidity").as("avg_humidity"),
        max("temperature").as("max_temperature"),
        max("humidity").as("max_humidity"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd-HH").as("hour"),
        col("client_id"), col("avg_temperature"), col("avg_humidity"),
        col("max_temperature"), col("max_humidity"), col("n"))

  /** Stream-stream interval join: enrich each left-stream record with
    * right-stream records for the same device within `withinSeconds`
    * BEFORE it (e.g. rejoin the two fan-out legs, or correlate commands
    * with subsequent readings). Both sides carry watermarks and the join
    * condition bounds the time range in both directions — Spark can then
    * evict join state as the watermarks advance; an unbounded condition
    * would buffer both streams forever.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      withinSeconds: Int, watermark: String = "1 minute",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("timestamp", watermark)
    val r = right.select(
      col("client_id").as("r_client_id"),
      col("timestamp").as("r_timestamp"),
      col("temperature").as("r_temperature"),
      col("count").as("r_count"))
      .withWatermark("r_timestamp", watermark)
    // `leftOuter` is the enrich-or-emit form: a left record whose join
    // window closes unmatched (both watermarks past its interval) emits
    // ONCE with null right columns instead of being dropped — Spark
    // holds it in state exactly until the time bound + watermark proves
    // no match can still arrive, so outer state is as bounded as inner.
    l.join(r,
      col("client_id") === col("r_client_id")
        && col("r_timestamp") >= col("timestamp") - expr(s"INTERVAL $withinSeconds SECONDS")
        && col("r_timestamp") < col("timestamp"),
      joinType)
  }

  /** SRC-5: Kinesis-style fan-out — one logical stream, two independent
    * consumers with separate checkpoints (the reference's S3 and
    * OpenSearch Firehose paths, README.md:53, 100-114). Returns both
    * running queries.
    */
  def fanOut(stream: DataFrame,
      mkSink1: DataFrame => DataStreamWriter[Row],
      mkSink2: DataFrame => DataStreamWriter[Row]): (StreamingQuery, StreamingQuery) =
    (mkSink1(stream).start(), mkSink2(stream).start())
}
