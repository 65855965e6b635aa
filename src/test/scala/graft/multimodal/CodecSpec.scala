package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[WavCodec]] / [[BmpCodec]] laws, independent of Spark: encode→decode
  * round-trips bit-exactly, malformed payloads refuse loudly, and the
  * two format quirks the oracled queries lean on — BMP row padding and
  * bottom-up row order — are pinned on hand-laid byte patterns.
  */
class CodecSpec extends AnyFunSuite {

  test("WAV: encode→decode round-trips samples and rate exactly") {
    for (d <- Seq(0L, 1L, 17L, 4095L)) {
      val (rate, samples) = Multimodal.wavSamples(d)
      val decoded = WavCodec.decode(WavCodec.encode(samples, rate))
      assert(decoded.sampleRate == rate)
      assert(decoded.samples.toSeq == samples.toSeq)
    }
    // Extremes survive (sign-sensitive: a byte-order bug flips these).
    val ext = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    assert(WavCodec.decode(WavCodec.encode(ext, 44100)).samples.toSeq == ext.toSeq)
  }

  test("WAV: decoder walks and skips unknown RIFF chunks") {
    // Insert a LIST chunk of junk between fmt and data — real writers
    // emit these; a 44-byte-offset "parser" would misread the samples.
    val base = WavCodec.encode(Array[Short](7, -7, 300), 8000)
    val (head, data) = base.splitAt(36) // RIFF..fmt block | data chunk
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(0x5a)
    val withJunk = head ++ junk ++ data
    assert(WavCodec.decode(withJunk).samples.toSeq == Seq[Short](7, -7, 300))
  }

  test("WAV: malformed payloads refuse loudly") {
    val good = WavCodec.encode(Array[Short](1, 2, 3), 8000)
    def bad(bytes: Array[Byte]) =
      intercept[IllegalArgumentException](WavCodec.decode(bytes))
    bad(good.take(20)) // truncated below header size
    bad("JUNK".getBytes ++ good.drop(4)) // wrong magic
    val nonPcm = good.clone; nonPcm(20) = 3 // format tag -> IEEE float
    bad(nonPcm)
    val stereo = good.clone; stereo(22) = 2 // channels -> 2
    bad(stereo)
    val deep = good.clone; deep(34) = 24 // bits -> 24
    bad(deep)
    assert(WavCodec.tryDecode(good).isDefined)
    assert(WavCodec.tryDecode(good.take(20)).isEmpty)
  }

  test("BMP: encode→decode round-trips all pad widths") {
    for (w <- 5 to 8; h <- Seq(1, 3)) { // pads 1, 2, 3, 0 bytes
      val n = w * h
      val img = BmpCodec.BmpImage(w, h,
        Array.tabulate(n)(i => (i * 7) % 256),
        Array.tabulate(n)(i => (i * 11 + 3) % 256),
        Array.tabulate(n)(i => (255 - i) % 256))
      val out = BmpCodec.decode(BmpCodec.encode(img))
      assert(out.width == w && out.height == h)
      assert(out.b.toSeq == img.b.toSeq && out.g.toSeq == img.g.toSeq &&
        out.r.toSeq == img.r.toSeq, s"w=$w h=$h")
    }
  }

  test("BMP: bottom-up storage and padding pinned on hand-laid bytes") {
    // 2x2 image, distinct channel values per pixel. Stored rows must be
    // bottom-up: first stored row = image row y=1. Row size 2*3=6 pads
    // to 8.
    val img = BmpCodec.BmpImage(2, 2,
      b = Array(10, 20, 30, 40), g = Array(11, 21, 31, 41),
      r = Array(12, 22, 32, 42))
    val bytes = BmpCodec.encode(img)
    assert(bytes.length == 54 + 16)
    // First stored pixel = image (x=0, y=1) -> b=30, g=31, r=32.
    assert((bytes(54) & 0xff) == 30 && (bytes(55) & 0xff) == 31 &&
      (bytes(56) & 0xff) == 32)
    // Padding bytes close each stored row.
    assert(bytes(60) == 0 && bytes(61) == 0 && bytes(68) == 0 && bytes(69) == 0)
    // Second stored row starts at the padded offset with image y=0.
    assert((bytes(62) & 0xff) == 10)
    val back = BmpCodec.decode(bytes)
    assert(back.b.toSeq == img.b.toSeq && back.r.toSeq == img.r.toSeq)
  }

  test("BMP: malformed payloads refuse loudly") {
    val good = BmpCodec.encode(Multimodal.bmpImage(5L))
    def bad(bytes: Array[Byte]) =
      intercept[IllegalArgumentException](BmpCodec.decode(bytes))
    bad(good.take(40)) // truncated headers
    val magic = good.clone; magic(0) = 'X'.toByte
    bad(magic)
    val bpp8 = good.clone; bpp8(28) = 8 // bits per pixel -> 8
    bad(bpp8)
    val rle = good.clone; rle(30) = 1 // compression -> BI_RLE8
    bad(rle)
    bad(good.dropRight(4)) // pixel data overruns payload
    assert(BmpCodec.tryDecode(good).isDefined)
  }

  test("class images: one-pixel perturbation, valid bytes, stable dims per class") {
    for (c <- 0 until 16) {
      val a = Multimodal.bmpClassImage(c.toLong) // d/16 even
      val p = Multimodal.bmpClassImage(c.toLong + 16L) // d/16 odd
      assert(a.width == p.width && a.height == p.height)
      // Differ in exactly the (0,0) blue channel, by exactly 1.
      assert(p.b(0) - a.b(0) == 1)
      assert(a.b.drop(1).toSeq == p.b.drop(1).toSeq)
      assert(a.g.toSeq == p.g.toSeq && a.r.toSeq == p.r.toSeq)
      assert((a.b ++ a.g ++ a.r ++ p.b).forall(v => v >= 0 && v <= 255))
    }
  }
}
