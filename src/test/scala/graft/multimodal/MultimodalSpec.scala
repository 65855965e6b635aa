package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def media = Seq(
    (1L, "hello world"), (2L, "hello world"), (3L, "different payload bytes"))
    .toDF("doc_id", "text")

  test("attachPayload: binary column + queryable metadata") {
    val df = attachPayload(media)
    assert(df.schema("payload").dataType.typeName == "binary")
    val r = df.where($"media_id" === 1).head()
    assert(r.getAs[Long]("n_bytes") == 11L)
    assert(r.getAs[String]("media_type") == "text/plain")
  }

  test("stubDecodeFeatures: deterministic per content, fixed feature dim") {
    val ds = attachPayload(media).as[MediaRecord]
    val feats = stubDecodeFeatures(ds, dim = 8).collect().sortBy(_.media_id)
    assert(feats.forall(_.features.length == 8))
    assert(feats(0).checksum == feats(1).checksum, "same bytes → same checksum")
    assert(feats(0).checksum != feats(2).checksum)
    assert(feats(0).features.toSeq == feats(1).features.toSeq)
  }

  test("sampleFrames: fixed-stride byte slices with no empty frames") {
    val frames = sampleFrames(attachPayload(media), frameSize = 4, stride = 8, maxFrames = 4)
      .collect()
    assert(frames.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
    val f1 = frames.filter(_.getAs[Long]("media_id") == 1L)
    assert(f1.length == 2) // 11 bytes: offsets 0 and 8 yield frames
  }

  test("resizeHalf: hand-laid 4x2 box means, floor division, odd column dropped") {
    // 5x2 input: the 5th column must be dropped (w2 = 2), h2 = 1.
    val b = Array(0, 1, 2, 3, 99, 4, 5, 6, 7, 99) // block means: (0+1+4+5)/4=2, (2+3+6+7)/4=4
    val g = b.map(_ + 10)
    val r = Array(1, 2, 1, 2, 99, 2, 2, 2, 1, 99) // (1+2+2+2)/4=7/4→1, (1+2+2+1)/4=6/4→1
    val out = resizeHalf(BmpCodec.BmpImage(5, 2, b, g, r))
    assert(out.width == 2 && out.height == 1)
    assert(out.b.toSeq == Seq(2, 4))
    assert(out.g.toSeq == Seq(12, 14))
    assert(out.r.toSeq == Seq(1, 1), "floor, not round-half-up")
    intercept[IllegalArgumentException] {
      resizeHalf(BmpCodec.BmpImage(1, 4, Array.fill(4)(0), Array.fill(4)(0), Array.fill(4)(0)))
    }
  }

  test("audioFrameFeatures: planted frames — energy, clip max, crossings at frame scope") {
    // 2 frames of 4: frame 0 = [3, -1, 2, -2] (3 sign flips),
    // frame 1 = [5, 5, -5, 0] (one flip; 0 product never counts),
    // tail [7] dropped (incomplete).
    val samples = Array[Short](3, -1, 2, -2, 5, 5, -5, 0, 7)
    val rec = Seq(MediaRecord(9L, WavCodec.encode(samples, 8000), "audio/wav", 0L)).toDS()
    val rows = audioFrameFeatures(rec, frameLen = 4)
      .orderBy("frame_no").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("sum_abs") == 8L)
    assert(rows(0).getAs[Long]("max_abs") == 3L)
    assert(rows(0).getAs[Long]("crossings") == 3L)
    assert(rows(1).getAs[Long]("sum_abs") == 15L)
    assert(rows(1).getAs[Long]("max_abs") == 5L)
    assert(rows(1).getAs[Long]("crossings") == 1L)
  }

  test("wav class law: one-sample perturbation, families share dims, probes in bounds") {
    val (r0, s0) = wavClassSamples(4L) // class 4, even d/16
    val (r1, s1) = wavClassSamples(20L) // class 4, odd d/16
    assert(r0 == r1 && s0.length == s1.length)
    assert(s1(0) == s0(0) + 1 && s1.drop(1).sameElements(s0.drop(1)))
    val (_, s2) = wavClassSamples(5L) // different class: different pattern
    assert(!s2.take(8).sameElements(s0.take(8)))
    // probe indices 7j stay in bounds for the shortest class (n = 64)
    assert((0 until 8).forall(j => 7 * j < 64))
  }

  test("wavProbeEmbeddings reads decoded samples at the probe indices") {
    val rec = Seq(MediaRecord(36L, // class 4: n = 64
        WavCodec.encode(wavClassSamples(36L)._2, 8000), "audio/wav", 0L)).toDS()
    val e = wavProbeEmbeddings(rec).head()
      .getAs[scala.collection.Seq[Float]]("embedding")
    val expect = wavClassSamples(36L)._2
    assert(e.toSeq == (0 until 8).map(j => expect(7 * j).toFloat))
  }

  test("decodeAviFeatures: hand-computed sums, frame-order weight, motion") {
    // Two 1x1 frames with distinct r values: motion = |r1 - r0|, and the
    // weighted sum separates frame order (w·h = 1: weights 1 and 2).
    val f0 = BmpCodec.BmpImage(1, 1, Array(10), Array(20), Array(30))
    val f1 = BmpCodec.BmpImage(1, 1, Array(11), Array(21), Array(25))
    val rec = Seq(MediaRecord(5L, AviCodec.encode(Array(f0, f1), fps = 10),
      "video/avi", 0L)).toDS()
    val r = decodeAviFeatures(rec).head()
    assert(r.getAs[Long]("n_frames") == 2L)
    assert(r.getAs[Long]("sum_b") == 21L && r.getAs[Long]("sum_g") == 41L)
    assert(r.getAs[Long]("sum_r") == 55L)
    assert(r.getAs[Long]("wsum_r") == 1L * 30 + 2L * 25) // swap ⇒ 85, not 80
    assert(r.getAs[Long]("sum_motion") == 5L)
  }

  test("aviFrameSample: stride keeps frames 0 and 2, per-frame features") {
    // Three 2x1 frames; stride 2 samples frames 0 and 2 only.
    def fr(v: Int) = BmpCodec.BmpImage(2, 1,
      Array(v, v + 1), Array(v + 2, v + 3), Array(v + 4, v + 5))
    val rec = Seq(MediaRecord(7L,
      AviCodec.encode(Array(fr(0), fr(50), fr(100)), fps = 10),
      "video/avi", 0L)).toDS()
    val rows = aviFrameSample(rec, stride = 2).orderBy("frame_no").collect()
    assert(rows.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 2L))
    assert(rows(0).getAs[Long]("sum_r") == 4L + 5L)
    assert(rows(1).getAs[Long]("sum_r") == 104L + 105L)
    assert(rows(1).getAs[Long]("wsum_r") == 1L * 104 + 2L * 105)
  }

  test("avi class law: one-byte perturbation survives the container round-trip; probes read it") {
    // Classes share shape within a family; the probe embedding must
    // differ ONLY in feature 0 (the perturbed frame-0 (0,0) blue byte,
    // recentered 2·ch − 255 ⇒ a 2-unit gap), read from DECODED frames.
    val recs = Seq(4L, 20L).map { d => // class 4, even/odd d/16
      MediaRecord(d, AviCodec.encode(aviClassFrames(d), fps = 10),
        "video/avi", 0L)
    }.toDS()
    val es = aviProbeEmbeddings(recs).orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    assert(es(1)(0) - es(0)(0) == 2.0f)
    assert(es(0).drop(1) == es(1).drop(1))
    // And the probe features match the law directly (t = j%2, x = j%5,
    // y = j%3, channel j%3) for the unperturbed member.
    val frames = aviClassFrames(4L)
    val expect = (0 until 8).map { j =>
      val f = frames(j % 2)
      val i = (j % 3) * f.width + (j % 5)
      val ch = (j % 3) match {
        case 0 => f.b(i); case 1 => f.g(i); case _ => f.r(i)
      }
      (2 * ch - 255).toFloat
    }
    assert(es(0).toSeq == expect)
  }
}
