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

  // ------------------------------------------------------------------
  // REAL-format decode tier ([[WavCodec]] / [[BmpCodec]]): payloads are
  // synthesized from doc_id by pure INTEGER formulas, encoded into
  // genuine WAV/BMP bytes, and features are extracted from the DECODED
  // bytes — never from the formula. The DuckDB oracle replays only the
  // generating formula, so a hash match certifies the entire binary
  // path: header layout, chunk walking, BMP row padding (widths 5..8
  // pad 1,2,3,0 bytes) and bottom-up row order. Every stage is
  // `mapPartitions` (per-partition codec amortization, zero driver
  // state) — the shape a real image/audio decode runs at 100 TB.
  // ------------------------------------------------------------------

  /** Synthesized audio law (shared by [[synthWavAssets]] and the q_mm3
    * oracle): n = 64 + d%64 samples at rate 8000 + 1000·(d%4) Hz,
    * sample i = ((d·31 + i·7) mod 4096) − 2048. Integer-only, so the
    * oracle states it in SQL verbatim.
    */
  def wavSamples(d: Long): (Int, Array[Short]) = {
    val n = (64 + d % 64).toInt
    val samples = Array.tabulate(n)(i => (((d * 31 + i * 7) % 4096) - 2048).toShort)
    ((8000 + 1000 * (d % 4)).toInt, samples)
  }

  /** WAV assets over `docs`: one mono PCM-16 payload per doc_id via
    * [[WavCodec.encode]]. When `corruptMod > 0`, payloads of doc_id ≡
    * `corruptRes` (mod `corruptMod`) are truncated to 20 bytes — a
    * deterministic "transfer-mangled asset" population for the
    * integrity audit (20 < the 44-byte header, so [[WavCodec.decode]]
    * genuinely rejects them, and the oracle predicts which by residue).
    */
  def synthWavAssets(docs: DataFrame, corruptMod: Int = 0,
      corruptRes: Int = 0): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val (rate, samples) = wavSamples(d)
        val full = WavCodec.encode(samples, rate)
        val payload =
          if (corruptMod > 0 && d % corruptMod == corruptRes) full.take(20)
          else full
        MediaRecord(d, payload, "audio/wav", payload.length.toLong)
      }
    }
  }

  /** Decode WAV assets ([[WavCodec.decode]] — throws on malformed) and
    * emit integer features of the decoded samples: count, rate, sum,
    * min, max, and the position-weighted Σ(i+1)·sᵢ that pins sample
    * ORDER (an endianness or offset bug preserves the sums but not the
    * weighted sum).
    */
  def decodeWavFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val a = WavCodec.decode(m.payload)
        var (sum, wsum) = (0L, 0L)
        var (mn, mx) = (Int.MaxValue, Int.MinValue)
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          sum += s; wsum += (i + 1).toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        (m.media_id, a.sampleRate.toLong, a.samples.length.toLong, sum,
          mn.toLong, mx.toLong, wsum)
      }
    }.toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s",
      "max_s", "wsum")
  }

  /** Synthesized image law (shared with the q_mm4 oracle): w = 5 + d%4
    * (exercising all three BMP pad widths), h = 3 + d%3, channels
    * b = (d + 3x + 7y) % 256, g = (2d + 5x + y) % 256,
    * r = (3d + x + 11y) % 256, top-down row-major.
    */
  def bmpImage(d: Long): BmpCodec.BmpImage = {
    val w = (5 + d % 4).toInt
    val h = (3 + d % 3).toInt
    val n = w * h
    val (b, g, r) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        b(i) = ((d + 3 * x + 7 * y) % 256).toInt
        g(i) = ((2 * d + 5 * x + y) % 256).toInt
        r(i) = ((3 * d + x + 11 * y) % 256).toInt
        x += 1
      }
      y += 1
    }
    BmpCodec.BmpImage(w, h, b, g, r)
  }

  /** Class-structured image law for the modality near-dup tier (q_mm6):
    * the pattern depends on the CLASS c = d % 16 (w = 5 + c%4,
    * h = 3 + c%3, channels linear in (c, x, y) mod 255), plus a 1-count
    * perturbation of pixel (0,0)'s blue channel for odd d/16 — so every
    * class is a near-duplicate family (same image up to one pixel) and
    * distinct classes are unrelated patterns.
    */
  def bmpClassImage(d: Long): BmpCodec.BmpImage = {
    val c = d % 16
    val w = (5 + c % 4).toInt
    val h = (3 + c % 3).toInt
    val n = w * h
    val (b, g, r) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        b(i) = ((c * 17 + 3 * x + 7 * y) % 255).toInt
        g(i) = ((c * 29 + 5 * x + y) % 255).toInt
        r(i) = ((c * 41 + x + 11 * y) % 255).toInt
        x += 1
      }
      y += 1
    }
    b(0) += ((d / 16) % 2).toInt // ≤ 254 + 1: still a valid byte
    BmpCodec.BmpImage(w, h, b, g, r)
  }

  /** BMP assets over `docs` via `imageOf` (one of the laws above) +
    * [[BmpCodec.encode]].
    */
  def synthBmpAssets(docs: DataFrame, imageOf: Long => BmpCodec.BmpImage)
      : Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val payload = BmpCodec.encode(imageOf(d))
        MediaRecord(d, payload, "image/bmp", payload.length.toLong)
      }
    }
  }

  /** Decode BMP assets and emit integer features: dimensions, per-
    * channel sums, and the position-weighted Σ(y·w+x+1)·r(x,y) — the
    * feature that breaks if padding is mis-skipped or bottom-up order
    * is not undone (both shift which byte lands at which (x, y)).
    */
  def decodeBmpFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = BmpCodec.decode(m.payload)
        var (sb, sg, sr, wr) = (0L, 0L, 0L, 0L)
        var i = 0
        while (i < img.b.length) {
          sb += img.b(i); sg += img.g(i); sr += img.r(i)
          wr += (i + 1).toLong * img.r(i)
          i += 1
        }
        (m.media_id, img.width.toLong, img.height.toLong,
          (img.width * img.height).toLong, sb, sg, sr, wr)
      }
    }.toDF("media_id", "width", "height", "n_pixels", "sum_b", "sum_g",
      "sum_r", "wsum_r")
  }

  /** Integer 2×2 box-filter downsample — the RESIZE verb of the
    * multimodal tier, pure integer arithmetic so the oracle replays it
    * exactly: out pixel (x2, y2) = floor of the mean of the input 2×2
    * block at (2x2.., 2y2..), per channel; odd trailing row/column
    * dropped (floor dims). Stateless per-image work, mapPartitions
    * territory like the codecs.
    */
  def resizeHalf(img: BmpCodec.BmpImage): BmpCodec.BmpImage = {
    val w2 = img.width / 2
    val h2 = img.height / 2
    require(w2 > 0 && h2 > 0,
      s"resizeHalf needs dims >= 2, got ${img.width}x${img.height}")
    val n = w2 * h2
    val (b, g, r) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        val i00 = (2 * y2) * img.width + 2 * x2
        val i10 = i00 + 1
        val i01 = i00 + img.width
        val i11 = i01 + 1
        val o = y2 * w2 + x2
        b(o) = (img.b(i00) + img.b(i10) + img.b(i01) + img.b(i11)) / 4
        g(o) = (img.g(i00) + img.g(i10) + img.g(i01) + img.g(i11)) / 4
        r(o) = (img.r(i00) + img.r(i10) + img.r(i01) + img.r(i11)) / 4
        x2 += 1
      }
      y2 += 1
    }
    BmpCodec.BmpImage(w2, h2, b, g, r)
  }

  /** Decode → [[resizeHalf]] → RE-ENCODE → decode → features: the
    * resized image travels back through the codec before features are
    * taken, so the round-trip certifies the encoder on the resized
    * dimension set too (w2 ∈ {2,3,4} exercises row pads 2,3,0 — a
    * different pad population than the full-size assets'). Feature
    * schema mirrors [[decodeBmpFeatures]] on the RESIZED image.
    */
  def resizeBmpFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = BmpCodec.decode(
          BmpCodec.encode(resizeHalf(BmpCodec.decode(m.payload))))
        var (sb, sg, sr, wr) = (0L, 0L, 0L, 0L)
        var i = 0
        while (i < img.b.length) {
          sb += img.b(i); sg += img.g(i); sr += img.r(i)
          wr += (i + 1).toLong * img.r(i)
          i += 1
        }
        (m.media_id, img.width.toLong, img.height.toLong,
          (img.width * img.height).toLong, sb, sg, sr, wr)
      }
    }.toDF("media_id", "width", "height", "n_pixels", "sum_b", "sum_g",
      "sum_r", "wsum_r")
  }

  /** Frame features over DECODED samples — the frame-sample verb at
    * sample level (q_mm2 slices raw bytes; this slices the decoded PCM
    * stream): complete windows of `frameLen` samples, per frame the
    * integer features an audio curation pass bins on — Σ|s| (energy
    * proxy), max |s| (clip detection), zero-crossing count (the
    * classic voiced/unvoiced discriminator), all integer-exact so the
    * oracle replays them. Incomplete tail window dropped (floor
    * count), matching the oracle's `(n div frameLen) · frameLen` cut.
    */
  def audioFrameFeatures(media: Dataset[MediaRecord], frameLen: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val a = WavCodec.decode(m.payload)
        val nf = a.samples.length / frameLen
        (0 until nf).iterator.map { f =>
          val base = f * frameLen
          var (sumAbs, maxAbs, crossings) = (0L, 0L, 0L)
          var i = 0
          while (i < frameLen) {
            val s = a.samples(base + i).toInt
            val abs = math.abs(s).toLong
            sumAbs += abs
            if (abs > maxAbs) maxAbs = abs
            if (i > 0 && a.samples(base + i - 1).toInt * s < 0) crossings += 1
            i += 1
          }
          (m.media_id, f.toLong, sumAbs, maxAbs, crossings)
        }
      }
    }.toDF("media_id", "frame_no", "sum_abs", "max_abs", "crossings")
  }

  /** Class-structured audio law for the audio near-dup leg (q_mm9),
    * [[bmpClassImage]]'s shape on the WAV side: the sample pattern
    * depends on the CLASS c = d % 16 (n = 64 + 16·(c % 4) samples,
    * rate 8000 + 1000·(c % 4), sample i = ((c·31 + i·7) mod 4096) −
    * 2048), plus a 1-count perturbation of sample 0 for odd d/16 — 16
    * near-duplicate families, unrelated across classes.
    */
  def wavClassSamples(d: Long): (Int, Array[Short]) = {
    val c = d % 16
    val n = (64 + 16 * (c % 4)).toInt
    val samples = Array.tabulate(n)(i =>
      (((c * 31 + i * 7) % 4096) - 2048).toShort)
    samples(0) = (samples(0) + ((d / 16) % 2).toInt).toShort // ≤ 2047+1: no wrap at these values
    ((8000 + 1000 * (c % 4)).toInt, samples)
  }

  /** WAV assets under a pluggable sample law. */
  def synthWavAssetsBy(docs: DataFrame, samplesOf: Long => (Int, Array[Short]))
      : Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val (rate, samples) = samplesOf(d)
        val payload = WavCodec.encode(samples, rate)
        MediaRecord(d, payload, "audio/wav", payload.length.toLong)
      }
    }
  }

  /** Audio-probe embedding from DECODED samples, [[bmpProbeEmbeddings]]'
    * discipline on the WAV side: 8 fixed probe indices i = 7·j (within
    * bounds for every class since n ≥ 64) read the reconstructed PCM
    * stream directly — any header/offset/endianness slip reads a
    * different sample. Signed 16-bit values are already spread; the
    * float cast is exact (|s| ≤ 2048 ≪ 2^24).
    */
  def wavProbeEmbeddings(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val a = WavCodec.decode(m.payload)
        val feats = Array.tabulate(8)(j => a.samples(7 * j).toFloat)
        (m.media_id, feats)
      }
    }.toDF("vec_id", "embedding")
  }

  // ------------------------------------------------------------------
  // Video tier ([[AviCodec]]): the third real-format modality. Same
  // discipline as WAV/BMP — payloads synthesized from doc_id by integer
  // laws, encoded into genuine RIFF/AVI containers, features taken only
  // from DECODED frames; the oracle replays the generating formulas, so
  // a hash match certifies the whole container round-trip (nested LIST
  // walk, avih/strf cross-checks, per-frame DIB padding + bottom-up
  // undo). All stages `mapPartitions`, zero driver state.
  // ------------------------------------------------------------------

  /** Synthesized video law (shared with the q_mm10/q_mm11 oracles):
    * w = 5 + d%4, h = 3 + d%3 (the BMP laws' dimension grid, all three
    * row pads), nf = 2 + d%3 frames; frame t's channels are the image
    * law shifted per frame — b = (d + 3x + 7y + 13t) % 256,
    * g = (2d + 5x + y + 17t) % 256, r = (3d + x + 11y + 19t) % 256.
    * Integer-only, so the oracle states it in SQL verbatim.
    */
  def aviFrames(d: Long): Array[BmpCodec.BmpImage] = {
    val w = (5 + d % 4).toInt
    val h = (3 + d % 3).toInt
    val nf = (2 + d % 3).toInt
    Array.tabulate(nf) { t =>
      val n = w * h
      val (b, g, r) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          b(i) = ((d + 3 * x + 7 * y + 13 * t) % 256).toInt
          g(i) = ((2 * d + 5 * x + y + 17 * t) % 256).toInt
          r(i) = ((3 * d + x + 11 * y + 19 * t) % 256).toInt
          x += 1
        }
        y += 1
      }
      BmpCodec.BmpImage(w, h, b, g, r)
    }
  }

  /** Class-structured video law for the video near-dup leg (q_mm12),
    * [[bmpClassImage]] extended over time: pattern depends on the CLASS
    * c = d % 16 (w = 5 + c%4, h = 3 + c%3, nf = 2 + c%3 frames,
    * channels linear in (c, x, y, t) mod 255), plus a 1-count
    * perturbation of frame 0's pixel (0,0) blue channel for odd d/16 —
    * 16 near-duplicate families differing by one byte of one frame.
    */
  def aviClassFrames(d: Long): Array[BmpCodec.BmpImage] = {
    val c = d % 16
    val w = (5 + c % 4).toInt
    val h = (3 + c % 3).toInt
    val nf = (2 + c % 3).toInt
    val frames = Array.tabulate(nf) { t =>
      val n = w * h
      val (b, g, r) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          b(i) = ((c * 17 + 3 * x + 7 * y + 13 * t) % 255).toInt
          g(i) = ((c * 29 + 5 * x + y + 17 * t) % 255).toInt
          r(i) = ((c * 41 + x + 11 * y + 19 * t) % 255).toInt
          x += 1
        }
        y += 1
      }
      BmpCodec.BmpImage(w, h, b, g, r)
    }
    frames(0).b(0) += ((d / 16) % 2).toInt // ≤ 254 + 1: still a valid byte
    frames
  }

  /** AVI assets over `docs` under a pluggable frame law. */
  def synthAviAssets(docs: DataFrame,
      framesOf: Long => Array[BmpCodec.BmpImage]): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val payload = AviCodec.encode(framesOf(d), fps = 10)
        MediaRecord(d, payload, "video/avi", payload.length.toLong)
      }
    }
  }

  /** Decode AVI assets ([[AviCodec.decode]] — throws on malformed) and
    * emit per-VIDEO integer features: dimensions, frame count, summed
    * channels over all frames, the frame-and-position-weighted
    * Σ(t·w·h + y·w + x + 1)·r(x,y,t) that pins FRAME order on top of
    * pixel order (a swapped or dropped frame keeps the plain sums but
    * not this), and sum_motion = Σ_{t≥1} |r_t − r_{t−1}| summed over
    * pixels — the temporal-difference feature (scene-change / motion
    * proxy) that only exists for a modality with a time axis.
    */
  def decodeAviFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = AviCodec.decode(m.payload)
        val n = v.width * v.height
        var (sb, sg, sr, wr, motion) = (0L, 0L, 0L, 0L, 0L)
        var t = 0
        while (t < v.frames.length) {
          val f = v.frames(t)
          var i = 0
          while (i < n) {
            sb += f.b(i); sg += f.g(i); sr += f.r(i)
            wr += (t.toLong * n + i + 1) * f.r(i)
            if (t > 0) motion += math.abs(f.r(i) - v.frames(t - 1).r(i)).toLong
            i += 1
          }
          t += 1
        }
        (m.media_id, v.width.toLong, v.height.toLong, v.frames.length.toLong,
          sb, sg, sr, wr, motion)
      }
    }.toDF("media_id", "width", "height", "n_frames", "sum_b", "sum_g",
      "sum_r", "wsum_r", "sum_motion")
  }

  /** Every-k-th-frame sampling over DECODED frames — the frame-sample
    * verb at its natural granularity (q_mm2 slices raw container BYTES,
    * q_mm8 slices decoded audio SAMPLES; this takes every `stride`-th
    * decoded video FRAME), with per-sampled-frame features mirroring
    * [[decodeBmpFeatures]]: channel sums + the position-weighted
    * Σ(y·w+x+1)·r within the frame.
    */
  def aviFrameSample(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val v = AviCodec.decode(m.payload)
        val n = v.width * v.height
        (0 until v.frames.length by stride).iterator.map { t =>
          val f = v.frames(t)
          var (sb, sg, sr, wr) = (0L, 0L, 0L, 0L)
          var i = 0
          while (i < n) {
            sb += f.b(i); sg += f.g(i); sr += f.r(i)
            wr += (i + 1).toLong * f.r(i)
            i += 1
          }
          (m.media_id, t.toLong, sb, sg, sr, wr)
        }
      }
    }.toDF("media_id", "frame_no", "sum_b", "sum_g", "sum_r", "wsum_r")
  }

  /** Video-probe embedding from DECODED frames, the [[bmpProbeEmbeddings]]
    * discipline with the time axis in the probe set: 8 fixed sites
    * (t, x, y, ch) = (j mod 2, j mod 5, j mod 3, channel j mod 3) — all
    * in-bounds for every class (nf ≥ 2, w ≥ 5, h ≥ 3) — each feature
    * the signed 2·ch − 255. Probing exact (frame, pixel) coordinates is
    * the most container-sensitive embedding possible: any nested-chunk,
    * padding, or frame-order slip reads a different byte.
    */
  def aviProbeEmbeddings(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = AviCodec.decode(m.payload)
        val feats = Array.tabulate(8) { j =>
          val f = v.frames(j % 2)
          val i = (j % 3) * v.width + (j % 5)
          val ch = (j % 3) match {
            case 0 => f.b(i)
            case 1 => f.g(i)
            case _ => f.r(i)
          }
          (2 * ch - 255).toFloat
        }
        (m.media_id, feats)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Interleaved-AV audio law (shared with the q_mm13 oracle): n =
    * 48 + d%32 samples at rate 8000 + 1000·(d%4) Hz, sample
    * i = ((d·37 + i·11) mod 4096) − 2048 — multipliers deliberately
    * distinct from [[wavSamples]]' (31, 7), so an asset cross-wiring
    * slip (WAV law feeding the AVI audio track or vice versa) fails
    * the oracle. The video track is [[aviFrames]]' law unchanged.
    */
  def avSamples(d: Long): (Int, Array[Short]) = {
    val n = (48 + d % 32).toInt
    val samples = Array.tabulate(n)(i => (((d * 37 + i * 11) % 4096) - 2048).toShort)
    ((8000 + 1000 * (d % 4)).toInt, samples)
  }

  /** Interleaved audio+video AVI assets over `docs`: [[aviFrames]]'
    * video law + [[avSamples]]' audio law through
    * [[AviCodec.encodeAV]] — two strl entries, per frame one '00db'
    * DIB chunk then one '01wb' PCM chunk of the near-equal split.
    */
  def synthAvAssets(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val (rate, samples) = avSamples(d)
        val payload = AviCodec.encodeAV(aviFrames(d), fps = 10, samples, rate)
        MediaRecord(d, payload, "video/avi", payload.length.toLong)
      }
    }
  }

  /** Decode interleaved AV assets ([[AviCodec.decodeAV]] — throws on
    * malformed) and emit integer features over BOTH decoded tracks:
    * video dims/frame count and the frame-and-position-weighted wsum_r
    * (frame order, [[decodeAviFeatures]]' discipline); audio rate /
    * sample count / Σs / the position-weighted Σ(i+1)·sᵢ over the
    * RE-CONCATENATED pcm stream — the feature that breaks if the
    * interleaved '01wb' chunks come back in the wrong order or the
    * split arithmetic slips; and the interleave structure itself
    * (chunk count = frame count, first chunk's sample count = the
    * near-equal-split law).
    */
  def decodeAvFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = AviCodec.decodeAV(m.payload)
        val npx = v.width * v.height
        var wr = 0L
        var t = 0
        while (t < v.frames.length) {
          val f = v.frames(t)
          var i = 0
          while (i < npx) {
            wr += (t.toLong * npx + i + 1) * f.r(i)
            i += 1
          }
          t += 1
        }
        var (sum, wsum) = (0L, 0L)
        var i = 0
        while (i < v.samples.length) {
          val s = v.samples(i).toInt
          sum += s; wsum += (i + 1).toLong * s
          i += 1
        }
        (m.media_id, v.width.toLong, v.height.toLong, v.frames.length.toLong,
          wr, v.sampleRate.toLong, v.samples.length.toLong, sum, wsum,
          v.chunkSamples.length.toLong, v.chunkSamples.head.toLong)
      }
    }.toDF("media_id", "width", "height", "n_frames", "wsum_r",
      "sample_rate", "n_samples", "sum_s", "wsum_s", "n_chunks",
      "first_chunk_n")
  }

  /** Image-probe embedding from DECODED pixels: 8 fixed probe sites
    * (xⱼ, yⱼ) = (j mod 5, j mod 3) — in-bounds for every class since
    * w ≥ 5, h ≥ 3 — cycling channels b, g, r; each feature is the
    * signed 2·ch − 255. Probing exact coordinates is the most
    * decode-sensitive embedding possible (any padding/row-order slip
    * reads a different byte), and the signed recentering spreads class
    * directions so cosine near-dup separates families cleanly. Output
    * (vec_id, embedding float[8]) — integer-valued, so the float cast
    * is exact and the DuckDB replay agrees bit-for-bit.
    */
  def bmpProbeEmbeddings(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = BmpCodec.decode(m.payload)
        val feats = Array.tabulate(8) { j =>
          val i = (j % 3) * img.width + (j % 5)
          val ch = (j % 3) match {
            case 0 => img.b(i)
            case 1 => img.g(i)
            case _ => img.r(i)
          }
          (2 * ch - 255).toFloat
        }
        (m.media_id, feats)
      }
    }.toDF("vec_id", "embedding")
  }
}
