package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns next to typed metadata; decode/feature-extract runs batched
  * per partition so a real codec (image decode, audio resample, frame
  * sampling) drops in without changing the pipeline shape.
  *
  * The container has no media libraries, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecodeFeatures]]); the
  * Spark-side contract — binary payload column, metadata struct, typed
  * `mapPartitions` with per-partition (batch) processing, stable feature
  * schema — is real and tested.
  */
object Multimodal {

  /** A media row: payload + metadata. `payload` stands in for image/audio
    * bytes (here: utf-8 of the doc text — the plumbing is
    * format-agnostic).
    */
  case class MediaRecord(media_id: Long, payload: Array[Byte], media_type: String, n_bytes: Long)

  /** Extracted features: fixed-length vector + summary scalars, the shape
    * a downstream embedding/training stage consumes.
    */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long, features: Array[Float])

  /** Attach a binary payload + metadata struct to the documents table —
    * the ingest step of a multimodal pipeline (binary column stays
    * opaque; metadata is queryable/prunable without touching payloads).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("text/plain").as("media_type"),
      length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))

  /** STUB decode: stands in for `decode_image(payload)` /
    * `extract_mel(payload)`. Deterministic per payload byte content —
    * byte-histogram moments folded into `dim` pseudo-features. A real
    * implementation replaces ONLY the body of `featuresOf`; the
    * partition-batched iteration (amortized codec init per partition,
    * not per row) and the output schema stay.
    */
  def stubDecodeFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition init goes here in a real codec (decoder handles,
      // model weights, thread-local buffers).
      def featuresOf(payload: Array[Byte]): (Long, Array[Float]) = {
        var checksum = 0L
        val feats = new Array[Float](dim)
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          checksum = (checksum * 31 + b) & 0x7fffffffffffffffL
          feats(i % dim) += b / 255.0f
          i += 1
        }
        (checksum, feats)
      }
      rows.map { r =>
        val (checksum, feats) = featuresOf(r.payload)
        MediaFeatures(r.media_id, r.n_bytes, checksum, feats)
      }
    }
  }

  /** Fixed-offset "frame sampling" over a binary payload — the byte-level
    * analog of sampling every k-th video frame: slice `frameSize` bytes
    * every `stride` bytes. Pure built-ins (`substring` on binary).
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int, maxFrames: Int): DataFrame =
    media.select(col("media_id"), posexplode(
      array((0 until maxFrames).map(i =>
        substring(col("payload"), i * stride + 1, frameSize)): _*)).as(Seq("frame_no", "frame")))
      .where(length(col("frame")) > 0)
}
