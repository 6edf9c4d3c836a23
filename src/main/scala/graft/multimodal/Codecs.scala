package graft.multimodal

/** Pure-JVM, dependency-free media codecs for the multimodal column
  * tier: 24-bit uncompressed BMP (images; BITMAPFILEHEADER +
  * BITMAPINFOHEADER, bottom-up rows, 4-byte row stride) and 16-bit
  * PCM mono WAV (audio; canonical RIFF chunk layout). Both are
  * header + raw-samples formats, so decode is exact integer work that
  * a SQL oracle can reproduce byte-for-byte from the payload
  * (SparkEntry oracleSql `q_media_*` — hex(bytes) + fixed-offset
  * arithmetic), which is what makes the decode tier verifiable
  * cross-engine rather than a trust-me stub.
  *
  * "Video" is a stack of equal-shape BMP frames concatenated
  * back-to-back — frame k's header begins at k·frameSize, so frame
  * seek is container arithmetic (no scan), the same access shape a
  * real container index gives.
  *
  * All methods throw IllegalArgumentException on malformed payloads:
  * a decode tier that silently returns garbage on a truncated blob is
  * how corrupt shards poison a 100-TB corpus unnoticed.
  */
object Codecs {

  // ---- little-endian primitives over byte arrays ----

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  // ---- BMP (24-bit uncompressed, BITMAPINFOHEADER) ----

  /** Dimension cap: rejects hostile headers whose w·h would overflow
    * Int bound arithmetic (a 32k² frame is already 3 GiB of pixels —
    * far past any sane per-row payload). */
  val MaxDim: Int = 1 << 15

  /** Row stride: each pixel row is padded to a 4-byte boundary. */
  def bmpStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Total encoded size of one `width`×`height` 24-bit BMP. */
  def bmpSize(width: Int, height: Int): Int =
    54 + bmpStride(width) * height

  /** Decoded image: `pixels(y*width + x)` is `0xRRGGBB`, row 0 at the
    * TOP (decode flips the BMP's bottom-up storage order). */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  /** Encode top-down 0xRRGGBB pixels as a 24-bit BMP. */
  def encodeBmp24(img: Image): Array[Byte] = {
    val Image(w, h, px) = img
    require(px.length == w * h, s"pixel count ${px.length} != $w*$h")
    val stride = bmpStride(w)
    val out = new Array[Byte](bmpSize(w, h))
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong) // file size — also the frame-seek key
    putU32(out, 10, 54L)              // pixel data offset
    putU32(out, 14, 40L)              // BITMAPINFOHEADER size
    putU32(out, 18, w.toLong)
    putU32(out, 22, h.toLong)         // positive height = bottom-up rows
    putU16(out, 26, 1)                // planes
    putU16(out, 28, 24)               // bits per pixel
    putU32(out, 30, 0L)               // BI_RGB (uncompressed)
    putU32(out, 34, (stride * h).toLong)
    var y = 0
    while (y < h) {
      val rowBase = 54 + (h - 1 - y) * stride // flip: top-down → bottom-up
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val o = rowBase + x * 3
        out(o) = (p & 0xff).toByte          // B
        out(o + 1) = ((p >> 8) & 0xff).toByte  // G
        out(o + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit BMP starting at `off` (for frame stacks).
    * Returns the image plus the encoded byte length consumed. */
  def decodeBmp24At(b: Array[Byte], off: Int): (Image, Int) = {
    require(b.length >= off + 54, s"BMP truncated before header at $off")
    require(b(off) == 'B' && b(off + 1) == 'M', "bad BMP magic")
    val fileSize = u32(b, off + 2).toInt
    val dataOff = u32(b, off + 10).toInt
    val w = i32(b, off + 18)
    val h = i32(b, off + 22)
    // Cap dims so hostile headers can't overflow the bound arithmetic
    // or allocate absurd pixel buffers before the truncation check.
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"unsupported BMP dims ${w}x$h")
    require(u16(b, off + 28) == 24, "only 24-bit BMP supported")
    require(u32(b, off + 30) == 0L, "only uncompressed (BI_RGB) supported")
    require(dataOff >= 54, s"bad BMP pixel data offset $dataOff")
    val stride = bmpStride(w)
    require(b.length.toLong >= off.toLong + dataOff + stride.toLong * h,
      "BMP pixel data truncated")
    // The declared file size is the frame-stack seek key — a drifted
    // bfSize smaller than the pixel data would make stack consumers
    // slice misaligned frames far from the cause (fail loud instead)
    require(fileSize.toLong >= dataOff + stride.toLong * h,
      s"BMP declared size $fileSize smaller than its own pixel data")
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowBase = off + dataOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val o = rowBase + x * 3
        px(y * w + x) = ((b(o + 2) & 0xff) << 16) |
          ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        x += 1
      }
      y += 1
    }
    (Image(w, h, px), fileSize)
  }

  def decodeBmp24(b: Array[Byte]): Image = {
    val (img, size) = decodeBmp24At(b, 0)
    require(size == b.length,
      s"trailing bytes after BMP: payload ${b.length}, frame $size")
    img
  }

  /** Decode a concatenated-BMP frame stack (the "video" container):
    * frame k begins where frame k−1's declared file size ends. */
  def decodeBmpStack(b: Array[Byte]): Seq[Image] = {
    val frames = Seq.newBuilder[Image]
    var off = 0
    while (off < b.length) {
      val (img, size) = decodeBmp24At(b, off)
      frames += img
      require(size > 0, "zero-length frame")
      off += size
    }
    frames.result()
  }

  /** Nearest-neighbor resize to `side`×`side`: destination pixel
    * (x, y) samples source (x·w div side, y·h div side) — the exact
    * integer mapping the SQL oracle mirrors. */
  def resizeNearest(img: Image, side: Int): Image = {
    val out = new Array[Int](side * side)
    var y = 0
    while (y < side) {
      val sy = y * img.height / side
      var x = 0
      while (x < side) {
        out(y * side + x) = img.pixels(sy * img.width + x * img.width / side)
        x += 1
      }
      y += 1
    }
    Image(side, side, out)
  }

  // ---- compressed images via the JDK's ImageIO (zero new deps) ----

  /** Decode a compressed image (PNG, JPEG — whatever the JRE's
    * ImageIO registry reads) to the same top-down 0xRRGGBB [[Image]]
    * the BMP path produces. ImageIO returns null (not an exception)
    * on unrecognized bytes, so the fail-loud contract is enforced
    * here. PNG is lossless: decode(encodePng(img)) == img exactly,
    * which is what lets the compressed tier bridge to the
    * oracle-checked BMP path (decode → re-encode BMP24 must be
    * byte-identical to the independently encoded BMP). */
  def decodeCompressed(b: Array[Byte]): Image = {
    val bi =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(s"corrupt image payload: $e") }
    require(bi != null, "unrecognized compressed image payload")
    val (w, h) = (bi.getWidth, bi.getHeight)
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"unsupported image dims ${w}x$h")
    val px = new Array[Int](w * h)
    bi.getRGB(0, 0, w, h, px, 0, w)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 } // drop alpha
    Image(w, h, px)
  }

  /** Encode as PNG (lossless RGB). */
  def encodePng(img: Image): Array[Byte] = encodeImageIO(img, "png")

  /** Encode as JPEG (lossy — round-trips only approximately; the
    * decode side is still deterministic for fixed bytes + JRE). */
  def encodeJpeg(img: Image): Array[Byte] = encodeImageIO(img, "jpg")

  private def encodeImageIO(img: Image, fmt: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, img.width, img.height, img.pixels, 0, img.width)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, fmt, bos),
      s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  // ---- WAV (16-bit PCM mono, RIFF) ----

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode 16-bit mono PCM as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(audio: Audio): Array[Byte] = {
    val n = audio.samples.length
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, (36 + dataLen).toLong)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16L)              // fmt chunk size
    putU16(out, 20, 1)                // PCM
    putU16(out, 22, 1)                // mono
    putU32(out, 24, audio.sampleRate.toLong)
    putU32(out, 28, audio.sampleRate.toLong * 2) // byte rate
    putU16(out, 32, 2)                // block align
    putU16(out, 34, 16)               // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataLen.toLong)
    var i = 0
    while (i < n) {
      putU16(out, 44 + i * 2, audio.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 mono WAV. Walks the RIFF chunk list (rather than
    * assuming the canonical 44-byte layout) so payloads with extra
    * chunks (LIST/INFO metadata) still decode. */
  def decodeWavPcm16(b: Array[Byte]): Audio = {
    require(b.length >= 44, "WAV truncated before header")
    require(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
      "bad RIFF/WAVE magic")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= b.length && (sampleRate < 0 || samples == null)) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(b, off + 4).toInt
      // Fail loud on hostile chunk sizes: a u32 that wraps negative via
      // .toInt (e.g. 0xFFFFFFF8) would make the offset step non-advancing
      // and hang the executor task instead of throwing.
      require(size >= 0 && off.toLong + 8 + size <= b.length,
        s"WAV chunk '$id' at $off declares bad size $size")
      id match {
        case "fmt " =>
          require(u16(b, off + 8) == 1, "only PCM supported")
          require(u16(b, off + 10) == 1, "only mono supported")
          require(u16(b, off + 22) == 16, "only 16-bit supported")
          sampleRate = u32(b, off + 12).toInt
        case "data" =>
          require(off + 8 + size <= b.length, "WAV data truncated")
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = u16(b, off + 8 + i * 2).toShort; i += 1 }
          samples = s
        case _ => () // skip unknown chunk
      }
      off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(sampleRate, samples)
  }
}
