package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal REAL codec for uncompressed 24-bit AVI — the RIFF video
  * container (Microsoft "AVI RIFF File Reference" layout): a 'RIFF'
  * form of type 'AVI ' holding a nested LIST tree —
  *
  * {{{
  * RIFF 'AVI '
  *   LIST 'hdrl'
  *     avih (56-byte main header: frame period, total frames, streams,
  *           width, height, ...)
  *     LIST 'strl'
  *       strh (56-byte stream header: fccType 'vids', handler 'DIB ',
  *             scale/rate, length in frames)
  *       strf (40-byte BITMAPINFOHEADER — the same DIB header BMP uses)
  *   LIST 'movi'
  *     00db <DIB pixel array>   (one uncompressed frame, repeated)
  * }}}
  *
  * Completing the modality set next to [[WavCodec]] (audio) and
  * [[BmpCodec]] (image): what makes video decode GENUINE work beyond
  * those two is the NESTED chunk grammar — a LIST's payload begins with
  * a 4-byte list type and then holds child chunks, so the walker must
  * recurse (hdrl inside RIFF, strl inside hdrl) while still skipping
  * unknown chunks word-aligned at every level, and the frame payloads
  * reuse the exact DIB pixel layout BMP established (bottom-up rows,
  * BGR, 4-byte row padding — [[BmpCodec.decodeDib]] is shared, not
  * duplicated). The decoder cross-checks avih's declared frame count
  * and dimensions against strf and against the '00db' chunks actually
  * present, so a payload only decodes if the container is coherent.
  *
  * Supported surface (rejected loudly like the other codecs): one
  * 'vids' stream, 24-bit BI_RGB frames, '00db' (uncompressed) frame
  * chunks. Scale stance identical to [[WavCodec]]: stateless per-row
  * byte work inside `mapPartitions`, payloads never shuffled except as
  * the opaque binary column they arrive in.
  */
object AviCodec {

  /** Decoded video: per-second frame rate (rate/scale as written) and
    * the frames in presentation order, each a top-down [[BmpCodec.BmpImage]].
    */
  final case class AviVideo(fps: Int, frames: Array[BmpCodec.BmpImage]) {
    def width: Int = frames.head.width
    def height: Int = frames.head.height
  }

  private val FOURCC_RIFF = "RIFF".getBytes("US-ASCII")
  private val FOURCC_LIST = "LIST".getBytes("US-ASCII")

  /** Encode frames (all same dimensions) as a canonical uncompressed
    * 24-bit AVI with one 'vids' DIB stream at `fps` frames/second.
    */
  def encode(frames: Array[BmpCodec.BmpImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "all AVI frames must share dimensions")
    val dibLen = BmpCodec.rowSize(w) * h // even (rowSize is a multiple of 4)
    // Sizes, inside out: movi list = 'movi' + n * (8-byte chunk header + dib)
    val moviLen = 4 + frames.length * (8 + dibLen)
    val strlLen = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen) // 'hdrl' + avih + LIST strl
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen) // 'AVI ' + both LISTs
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)

    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")

    fourcc("LIST"); buf.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(dibLen * fps) // dwMaxBytesPerSec
      .putInt(0) // dwPaddingGranularity
      .putInt(0) // dwFlags
      .putInt(frames.length) // dwTotalFrames
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwStreams
      .putInt(dibLen) // dwSuggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]

    fourcc("LIST"); buf.putInt(strlLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0) // dwFlags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwScale
      .putInt(fps) // dwRate (fps = rate / scale)
      .putInt(0) // dwStart
      .putInt(frames.length) // dwLength, in frames
      .putInt(dibLen) // dwSuggestedBufferSize
      .putInt(-1) // dwQuality (default)
      .putInt(0) // dwSampleSize (0: frames vary / one chunk per frame)
      .putShort(0).putShort(0).putShort(0).putShort(0) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1) // planes
      .putShort(24) // bits per pixel
      .putInt(0) // BI_RGB
      .putInt(dibLen).putInt(2835).putInt(2835).putInt(0).putInt(0)

    fourcc("LIST"); buf.putInt(moviLen); fourcc("movi")
    frames.foreach { f =>
      fourcc("00db"); buf.putInt(dibLen)
      buf.put(BmpCodec.encodeDib(f))
    }
    buf.array()
  }

  /** Parse an AVI payload. Throws `IllegalArgumentException` on wrong
    * magics, a malformed chunk tree, non-'vids'/non-24-bit/compressed
    * streams, header/frame disagreements (avih vs strf dims, declared
    * vs present frame count, frame chunk size vs the DIB arithmetic),
    * or truncation. Unknown chunks AND unknown LISTs are skipped
    * word-aligned at every nesting level, as real writers emit idx1,
    * INFO lists, JUNK padding, etc.
    */
  def decode(bytes: Array[Byte]): AviVideo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"not an AVI: $msg")
    if (bytes.length < 12) fail(s"only ${bytes.length} bytes (RIFF header is 12)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    def fourcc(): String = { buf.get(magic); new String(magic, "US-ASCII") }
    if (fourcc() != "RIFF") fail("missing RIFF magic")
    buf.getInt // riff size — advisory; chunk walking is the truth
    if (fourcc() != "AVI ") fail("missing 'AVI ' form type")

    // Parsed state, filled in by the walk.
    var avihFrames = -1
    var avihW = -1
    var avihH = -1
    var fps = -1
    var strfW = -1
    var strfH = -1
    var sawVids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[BmpCodec.BmpImage]

    /** Walk the chunks of one level ending at `end`; `ctx` names the
      * enclosing list for error messages and dispatch.
      */
    def walk(end: Int, ctx: String): Unit = {
      while (buf.position() + 8 <= end) {
        val id = fourcc()
        val size = buf.getInt
        if (size < 0 || buf.position() + size > end)
          fail(s"$id chunk overruns $ctx")
        val body = buf.position()
        id match {
          case "LIST" =>
            if (size < 4) fail(s"LIST in $ctx too small ($size)")
            val listType = fourcc()
            (ctx, listType) match {
              case ("AVI ", "hdrl") => walk(body + size, "hdrl")
              case ("hdrl", "strl") => walk(body + size, "strl")
              case ("AVI ", "movi") => walk(body + size, "movi")
              case _ => // unknown list (INFO, odml, ...): skip whole
            }
          case "avih" if ctx == "hdrl" =>
            if (size < 56) fail(s"avih too small ($size)")
            val usPerFrame = buf.getInt
            buf.getInt; buf.getInt; buf.getInt
            avihFrames = buf.getInt
            buf.getInt
            val streams = buf.getInt
            if (streams != 1) fail(s"$streams streams (only 1 supported)")
            buf.getInt
            avihW = buf.getInt
            avihH = buf.getInt
            if (avihW <= 0 || avihH <= 0) fail(s"avih dims ${avihW}x$avihH")
            if (usPerFrame <= 0) fail(s"frame period $usPerFrame us")
            fps = 1000000 / usPerFrame
          case "strh" if ctx == "strl" =>
            if (size < 56) fail(s"strh too small ($size)")
            val fccType = fourcc()
            if (fccType != "vids") fail(s"stream type '$fccType' (only vids)")
            sawVids = true
          case "strf" if ctx == "strl" =>
            if (!sawVids) fail("strf before strh")
            if (size < 40) fail(s"strf too small ($size)")
            buf.getInt // biSize
            strfW = buf.getInt
            strfH = buf.getInt
            if (buf.getShort != 1) fail("strf planes != 1")
            val bpp = buf.getShort
            if (bpp != 24) fail(s"$bpp bpp (only 24 supported)")
            if (buf.getInt != 0) fail("compressed AVI frames unsupported")
            if (strfH <= 0) fail(s"strf height $strfH (top-down unsupported)")
            if (strfW != avihW || strfH != avihH)
              fail(s"strf ${strfW}x$strfH != avih ${avihW}x$avihH")
          case "00db" if ctx == "movi" =>
            if (strfW <= 0) fail("frame chunk before strf")
            val expected = BmpCodec.rowSize(strfW) * strfH
            if (size != expected)
              fail(s"frame chunk $size bytes, DIB arithmetic says $expected")
            frames += BmpCodec.decodeDib(bytes, body, strfW, strfH)
          case "00dc" if ctx == "movi" =>
            fail("compressed frame chunk 00dc unsupported")
          case _ => // unknown chunk (idx1, JUNK, vedt, ...): skip
        }
        buf.position(body + size + (size & 1)) // word-aligned advance
      }
    }
    walk(bytes.length, "AVI ")

    if (avihFrames < 0) fail("no avih header")
    if (strfW <= 0) fail("no strf stream format")
    if (frames.isEmpty) fail("no movi frames")
    if (frames.length != avihFrames)
      fail(s"avih declares $avihFrames frames, movi holds ${frames.length}")
    AviVideo(fps, frames.toArray)
  }

  /** Decode attempt as a predicate — the cross-modal integrity audits'
    * "asset is decodable" test (a malformed payload is data, not a bug).
    */
  def tryDecode(bytes: Array[Byte]): Option[AviVideo] =
    try Some(decode(bytes)) catch { case _: IllegalArgumentException => None }

  // ------------------------------------------------------------------
  // Interleaved audio+video ('00db' DIB frames next to '01wb' PCM
  // chunks, TWO strl entries) — the canonical AV container shape the
  // Microsoft AVI RIFF reference describes: stream n's chunks are
  // tagged '<nn>db'/'<nn>wb' by the stream's POSITION among the strl
  // lists, and a writer interleaves roughly one frame's worth of audio
  // after each video frame so a player never seeks. What this adds
  // over the single-stream walk: per-stream format dispatch inside the
  // same nested grammar (strf means BITMAPINFOHEADER in a vids strl
  // but PCMWAVEFORMAT in an auds strl), and chunk-id → stream binding
  // by strl ORDER.
  // ------------------------------------------------------------------

  /** Decoded AV asset: frames in presentation order, the PCM stream
    * re-CONCATENATED from the interleaved '01wb' chunks in order, and
    * the per-chunk sample counts (the interleave split itself — a
    * decoder output so the split law is certifiable).
    */
  final case class AviAV(fps: Int, sampleRate: Int,
      frames: Array[BmpCodec.BmpImage], samples: Array[Short],
      chunkSamples: Array[Int]) {
    def width: Int = frames.head.width
    def height: Int = frames.head.height
  }

  /** Samples of interleave chunk `t` of `nf`, for `n` total samples:
    * near-equal blocks, the remainder spread over the FIRST n mod nf
    * chunks (integer-exact, so an oracle can state it).
    */
  def chunkLen(n: Int, nf: Int, t: Int): Int =
    n / nf + (if (t < n % nf) 1 else 0)

  /** Encode frames + mono PCM-16 audio as a canonical interleaved AVI:
    * two strl entries (vids then auds), movi holding per frame t one
    * '00db' DIB chunk followed by one '01wb' chunk of [[chunkLen]]
    * samples.
    */
  def encodeAV(frames: Array[BmpCodec.BmpImage], fps: Int,
      samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(samples.length >= frames.length,
      s"need >= 1 sample per interleave chunk: ${samples.length} samples, " +
        s"${frames.length} frames")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "all AVI frames must share dimensions")
    val nf = frames.length
    val n = samples.length
    val dibLen = BmpCodec.rowSize(w) * h
    val moviLen = 4 + nf * (8 + dibLen) + nf * 8 + 2 * n
    val strlVLen = 4 + (8 + 56) + (8 + 40)
    val strlALen = 4 + (8 + 56) + (8 + 16)
    val hdrlLen = 4 + (8 + 56) + (8 + strlVLen) + (8 + strlALen)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)

    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")

    fourcc("LIST"); buf.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps)
      .putInt(dibLen * fps + 2 * sampleRate)
      .putInt(0).putInt(0)
      .putInt(nf)
      .putInt(0)
      .putInt(2) // dwStreams: vids + auds
      .putInt(dibLen)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)

    fourcc("LIST"); buf.putInt(strlVLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps).putInt(0)
      .putInt(nf).putInt(dibLen).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0)
      .putInt(dibLen).putInt(2835).putInt(2835).putInt(0).putInt(0)

    fourcc("LIST"); buf.putInt(strlALen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("auds"); buf.putInt(0) // handler: none for raw PCM
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1) // dwScale
      .putInt(sampleRate) // dwRate (samples/sec = rate / scale)
      .putInt(0)
      .putInt(n) // dwLength, in samples
      .putInt(2 * chunkLen(n, nf, 0)) // dwSuggestedBufferSize
      .putInt(-1)
      .putInt(2) // dwSampleSize: bytes per PCM-16 mono sample
      .putShort(0).putShort(0).putShort(0).putShort(0)
    fourcc("strf"); buf.putInt(16) // PCMWAVEFORMAT
    buf.putShort(1) // wFormatTag: PCM
      .putShort(1) // nChannels: mono
      .putInt(sampleRate)
      .putInt(2 * sampleRate) // nAvgBytesPerSec
      .putShort(2) // nBlockAlign
      .putShort(16) // wBitsPerSample

    fourcc("LIST"); buf.putInt(moviLen); fourcc("movi")
    var off = 0
    frames.zipWithIndex.foreach { case (f, t) =>
      fourcc("00db"); buf.putInt(dibLen)
      buf.put(BmpCodec.encodeDib(f))
      val len = chunkLen(n, nf, t)
      fourcc("01wb"); buf.putInt(2 * len)
      var i = 0
      while (i < len) { buf.putShort(samples(off + i)); i += 1 }
      off += len
    }
    buf.array()
  }

  /** Parse an interleaved AV payload: exactly two streams, vids-then-
    * auds strl order (the canonical writer layout — chunk ids bind to
    * streams by strl POSITION, so order is structural, not stylistic),
    * 24-bit BI_RGB '00db' frames, PCM-16 mono '01wb' audio. Throws on
    * wrong magics, stream-count/type/order surprises, non-PCM or
    * non-16-bit or multichannel audio, odd audio chunk bytes, dims or
    * frame-count or sample-count disagreements with the headers, or
    * truncation. Unknown chunks and LISTs skip word-aligned at every
    * level, as in [[decode]].
    */
  def decodeAV(bytes: Array[Byte]): AviAV = {
    def fail(msg: String) = throw new IllegalArgumentException(s"not an AV AVI: $msg")
    if (bytes.length < 12) fail(s"only ${bytes.length} bytes (RIFF header is 12)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    def fourcc(): String = { buf.get(magic); new String(magic, "US-ASCII") }
    if (fourcc() != "RIFF") fail("missing RIFF magic")
    buf.getInt
    if (fourcc() != "AVI ") fail("missing 'AVI ' form type")

    var avihFrames = -1
    var avihW = -1
    var avihH = -1
    var fps = -1
    var strfW = -1
    var strfH = -1
    var sampleRate = -1
    var declaredSamples = -1
    var strlIndex = -1 // position of the strl being walked
    var curType = "" // fccType of the strl being walked
    val frames = scala.collection.mutable.ArrayBuffer.empty[BmpCodec.BmpImage]
    val samples = scala.collection.mutable.ArrayBuffer.empty[Short]
    val chunkSamples = scala.collection.mutable.ArrayBuffer.empty[Int]

    def walk(end: Int, ctx: String): Unit = {
      while (buf.position() + 8 <= end) {
        val id = fourcc()
        val size = buf.getInt
        if (size < 0 || buf.position() + size > end)
          fail(s"$id chunk overruns $ctx")
        val body = buf.position()
        id match {
          case "LIST" =>
            if (size < 4) fail(s"LIST in $ctx too small ($size)")
            val listType = fourcc()
            (ctx, listType) match {
              case ("AVI ", "hdrl") => walk(body + size, "hdrl")
              case ("hdrl", "strl") =>
                strlIndex += 1
                curType = ""
                walk(body + size, "strl")
              case ("AVI ", "movi") => walk(body + size, "movi")
              case _ =>
            }
          case "avih" if ctx == "hdrl" =>
            if (size < 56) fail(s"avih too small ($size)")
            val usPerFrame = buf.getInt
            buf.getInt; buf.getInt; buf.getInt
            avihFrames = buf.getInt
            buf.getInt
            val streams = buf.getInt
            if (streams != 2) fail(s"$streams streams (AV form needs 2)")
            buf.getInt
            avihW = buf.getInt
            avihH = buf.getInt
            if (avihW <= 0 || avihH <= 0) fail(s"avih dims ${avihW}x$avihH")
            if (usPerFrame <= 0) fail(s"frame period $usPerFrame us")
            fps = 1000000 / usPerFrame
          case "strh" if ctx == "strl" =>
            if (size < 56) fail(s"strh too small ($size)")
            curType = fourcc()
            (strlIndex, curType) match {
              case (0, "vids") | (1, "auds") => // canonical order
              case _ => fail(s"stream $strlIndex is '$curType' " +
                "(AV form is vids then auds)")
            }
            if (curType == "auds") {
              buf.getInt // handler
              buf.getInt; buf.getShort; buf.getShort; buf.getInt
              val scale = buf.getInt
              val rate = buf.getInt
              buf.getInt
              declaredSamples = buf.getInt
              if (scale != 1) fail(s"audio scale $scale (only 1 supported)")
              sampleRate = rate
            }
          case "strf" if ctx == "strl" && curType == "vids" =>
            if (size < 40) fail(s"vids strf too small ($size)")
            buf.getInt
            strfW = buf.getInt
            strfH = buf.getInt
            if (buf.getShort != 1) fail("strf planes != 1")
            val bpp = buf.getShort
            if (bpp != 24) fail(s"$bpp bpp (only 24 supported)")
            if (buf.getInt != 0) fail("compressed AVI frames unsupported")
            if (strfH <= 0) fail(s"strf height $strfH (top-down unsupported)")
            if (strfW != avihW || strfH != avihH)
              fail(s"strf ${strfW}x$strfH != avih ${avihW}x$avihH")
          case "strf" if ctx == "strl" && curType == "auds" =>
            if (size < 16) fail(s"auds strf too small ($size)")
            if (buf.getShort != 1) fail("non-PCM audio unsupported")
            if (buf.getShort != 1) fail("only mono audio supported")
            val sps = buf.getInt
            if (sps != sampleRate)
              fail(s"strf rate $sps != strh rate $sampleRate")
            buf.getInt
            if (buf.getShort != 2) fail("block align != 2")
            if (buf.getShort != 16) fail("only PCM-16 supported")
          case "strf" if ctx == "strl" =>
            fail("strf before strh")
          case "00db" if ctx == "movi" =>
            if (strfW <= 0) fail("frame chunk before vids strf")
            val expected = BmpCodec.rowSize(strfW) * strfH
            if (size != expected)
              fail(s"frame chunk $size bytes, DIB arithmetic says $expected")
            frames += BmpCodec.decodeDib(bytes, body, strfW, strfH)
          case "01wb" if ctx == "movi" =>
            if (sampleRate <= 0) fail("audio chunk before auds strf")
            if (size % 2 != 0) fail(s"audio chunk $size bytes (odd for PCM-16)")
            val cn = size / 2
            var i = 0
            while (i < cn) { samples += buf.getShort(body + 2 * i); i += 1 }
            chunkSamples += cn
          case "00dc" if ctx == "movi" =>
            fail("compressed frame chunk 00dc unsupported")
          case _ =>
        }
        buf.position(body + size + (size & 1))
      }
    }
    walk(bytes.length, "AVI ")

    if (avihFrames < 0) fail("no avih header")
    if (strfW <= 0) fail("no vids strf")
    if (sampleRate <= 0) fail("no auds strf")
    if (frames.isEmpty) fail("no movi frames")
    if (frames.length != avihFrames)
      fail(s"avih declares $avihFrames frames, movi holds ${frames.length}")
    if (samples.length != declaredSamples)
      fail(s"auds strh declares $declaredSamples samples, movi holds " +
        s"${samples.length}")
    AviAV(fps, sampleRate, frames.toArray, samples.toArray,
      chunkSamples.toArray)
  }

  /** [[decodeAV]] as a predicate, [[tryDecode]]'s discipline. */
  def tryDecodeAV(bytes: Array[Byte]): Option[AviAV] =
    try Some(decodeAV(bytes)) catch { case _: IllegalArgumentException => None }
}
