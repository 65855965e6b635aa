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
}
