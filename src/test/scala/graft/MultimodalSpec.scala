package graft

import graft.multimodal.{Codecs, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ---- codec unit coverage (no Spark needed) ----

  test("BMP round-trip is exact across padded strides (w*3 % 4 != 0)") {
    for (w <- 8 to 20; h <- Seq(5, 9)) {
      val px = Array.tabulate(w * h)(p => (p * 2654435761L % 0x1000000).toInt)
      val img = Codecs.Image(w, h, px)
      val decoded = Codecs.decodeBmp24(Codecs.encodeBmp24(img))
      assert(decoded.width == w && decoded.height == h)
      assert(decoded.pixels.sameElements(px), s"mismatch at ${w}x$h")
    }
  }

  test("WAV round-trip is exact, including extreme sample values") {
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue,
      12345, -12345) ++ Array.tabulate(300)(t => ((t * 97) % 4001 - 2000).toShort)
    val a = Codecs.Audio(8000, samples)
    val back = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(a))
    assert(back.sampleRate == 8000)
    assert(back.samples.sameElements(samples))
  }

  test("WAV decode walks RIFF chunks: extra chunk before data still decodes") {
    val samples = Array.tabulate(10)(t => (t * 100).toShort)
    val canonical = Codecs.encodeWavPcm16(Codecs.Audio(44100, samples))
    // splice a 6-byte LIST chunk between fmt and data (pad to even)
    val pre = canonical.take(36)
    val post = canonical.drop(36)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0)
    val spliced = pre ++ extra ++ post
    // fix the RIFF size field
    spliced(4) = ((spliced.length - 8) & 0xff).toByte
    spliced(5) = (((spliced.length - 8) >> 8) & 0xff).toByte
    val back = Codecs.decodeWavPcm16(spliced)
    assert(back.sampleRate == 44100 && back.samples.sameElements(samples))
  }

  test("malformed payloads fail loudly, not with garbage features") {
    val img = Codecs.encodeBmp24(Codecs.Image(4, 4, new Array[Int](16)))
    intercept[IllegalArgumentException] {
      Codecs.decodeBmp24(img.take(30)) }          // truncated header
    intercept[IllegalArgumentException] {
      Codecs.decodeBmp24(img.take(img.length - 4)) } // truncated pixels
    val bad = img.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { Codecs.decodeBmp24(bad) }
    val wav = Codecs.encodeWavPcm16(Codecs.Audio(8000, Array[Short](1, 2)))
    intercept[IllegalArgumentException] {
      Codecs.decodeWavPcm16(wav.take(20)) }
  }

  test("hostile payloads throw instead of hanging or AIOOBE") {
    // WAV chunk whose declared u32 size wraps negative via .toInt
    // (0xFFFFFFF8): the chunk walker must throw, not loop forever on a
    // non-advancing offset.
    val wav = Codecs.encodeWavPcm16(
      Codecs.Audio(8000, Array.fill[Short](64)(5)))
    val evil = wav.clone()
    evil(40) = 0xf8.toByte; evil(41) = 0xff.toByte
    evil(42) = 0xff.toByte; evil(43) = 0xff.toByte
    intercept[IllegalArgumentException] { Codecs.decodeWavPcm16(evil) }

    // BMP header claiming huge dims: stride*h overflows Int, which
    // without Long bound arithmetic would pass the truncation require
    // and die later as ArrayIndexOutOfBoundsException.
    val img = Codecs.encodeBmp24(Codecs.Image(4, 4, new Array[Int](16)))
    val big = img.clone()
    big(18) = 0; big(19) = 0; big(20) = 2; big(21) = 0 // w = 0x20000
    big(22) = 0; big(23) = 0; big(24) = 2; big(25) = 0 // h = 0x20000
    intercept[IllegalArgumentException] { Codecs.decodeBmp24(big) }

    // Video metadata drift: claimed dims disagree with the parsed
    // frame header — sampleFrames must slice by the PARSED frame size.
    val frame = Codecs.encodeBmp24(
      Codecs.Image(9, 7, Array.tabulate(63)(_ * 17)))
    val drifted = graft.multimodal.MediaRecord(99L, "video", frame ++ frame, "bmps",
      width = 5, height = 5, duration_ms = 2000L)
    import spark.implicits._
    val out = Multimodal.sampleFrames(
      Seq(drifted).toDS(), everyNth = 1).collect()
    assert(out.length == 2)
    out.foreach(r => assert(Codecs.decodeBmp24(r.bytes).width == 9))
  }

  test("PNG: lossless round-trip, byte-identical re-encode to BMP") {
    val img = Codecs.Image(13, 9,
      Array.tabulate(117)(p => (p * 92821 + 17) % 0x1000000))
    val png = Codecs.encodePng(img)
    // real PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N')
    val back = Codecs.decodeCompressed(png)
    assert(back.width == 13 && back.height == 9)
    assert(back.pixels.sameElements(img.pixels), "PNG must be lossless")
    // the oracle bridge: decode(png) re-encoded as BMP must equal the
    // independent BMP encoding of the same pixels, byte for byte
    assert(Codecs.encodeBmp24(back).sameElements(Codecs.encodeBmp24(img)))
    // garbage payload fails loudly (ImageIO returns null, we throw)
    intercept[IllegalArgumentException] {
      Codecs.decodeCompressed(Array.fill[Byte](64)(7)) }
  }

  test("JPEG: decodes deterministically, close to source (lossy)") {
    // smooth gradient — JPEG's friendly case; bound the channel error
    val img = Codecs.Image(16, 16, Array.tabulate(256) { p =>
      val x = p % 16; val y = p / 16
      ((x * 12) << 16) | ((y * 12) << 8) | ((x + y) * 6)
    })
    val jpg = Codecs.encodeJpeg(img)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI
    val a = Codecs.decodeCompressed(jpg)
    val b = Codecs.decodeCompressed(jpg)
    assert(a.pixels.sameElements(b.pixels), "decode must be deterministic")
    assert(a.width == 16 && a.height == 16)
    val meanErr = img.pixels.zip(a.pixels).map { case (x, y) =>
      math.abs((x >> 16 & 0xff) - (y >> 16 & 0xff)) +
        math.abs((x >> 8 & 0xff) - (y >> 8 & 0xff)) +
        math.abs((x & 0xff) - (y & 0xff))
    }.sum / (3.0 * img.pixels.length)
    assert(meanErr < 8.0, s"mean channel error $meanErr too high")
  }

  test("PNG fixture: Spark decode stage matches independent BMP bytes") {
    val fx = Multimodal.pngCorpusParquet(spark, 12,
      java.nio.file.Files.createTempDirectory("graft-png").toString + "/px")
    val got = Multimodal.pngToBmpHex(fx).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = fx.select("media_id", "bmp_bytes").collect()
      .map(r => r.getLong(0) ->
        r.getAs[Array[Byte]](1).map("%02X".format(_)).mkString).toMap
    assert(got == want)
    assert(got.size == 12)
  }

  test("frame stack seek: decodeBmpStack recovers every frame exactly") {
    val frames = (0 until 4).map { f =>
      Codecs.Image(9, 7, Array.tabulate(63)(p => (p * 31 + f * 1000) % 0x1000000))
    }
    val stack = frames.toArray.flatMap(Codecs.encodeBmp24)
    val back = Codecs.decodeBmpStack(stack)
    assert(back.length == 4)
    back.zip(frames).foreach { case (a, b) =>
      assert(a.pixels.sameElements(b.pixels)) }
  }

  test("nearest-neighbor resize matches the integer mapping spec") {
    val w = 10; val h = 6
    val px = Array.tabulate(w * h)(identity)
    val r = Codecs.resizeNearest(Codecs.Image(w, h, px), 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(r.pixels(y * 4 + x) == px((y * h / 4) * w + (x * w / 4)))
  }

  // ---- Spark-side pipeline coverage ----

  test("corpus decode: headers parse, metadata cross-check passes for all") {
    val corpus = Multimodal.syntheticCorpus(spark, 60)
    val d = Multimodal.decodeHeaders(corpus).collect()
    assert(d.length == 60)
    assert(d.forall(_.meta_ok == 1L), "claimed metadata diverged from header")
    assert(d.filter(_.kind == "image").forall(x => x.n_frames == 1L &&
      x.width >= 8 && x.height >= 8))
    assert(d.filter(_.kind == "audio").forall(x =>
      x.sample_rate == 8000L && x.n_samples >= 200L))
    assert(d.filter(_.kind == "video").forall(x =>
      x.n_frames >= 2L && x.n_frames <= 4L))
  }

  test("image stats agree with a driver-side re-decode of the same bytes") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val stats = Multimodal.imageStats(corpus).collect()
      .map(s => s.media_id -> s).toMap
    corpus.filter(_.kind == "image").collect().foreach { r =>
      val img = Codecs.decodeBmp24(r.bytes)
      var sr = 0L; var sg = 0L; var sb = 0L
      img.pixels.foreach { p =>
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff }
      val s = stats(r.media_id)
      assert(s.sum_r == sr && s.sum_g == sg && s.sum_b == sb)
      assert(s.mean_luma_milli ==
        (299L * sr + 587L * sg + 114L * sb) / (img.width * img.height))
    }
  }

  test("audio stats: energy/peak/crossings consistent and bounded") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val stats = Multimodal.audioStats(corpus).collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.peak_abs <= 16008L)          // corpus amplitude bound
      assert(s.sum_abs >= math.abs(s.sum_s))
      assert(s.energy >= s.peak_abs * s.peak_abs)
      assert(s.zero_cross < s.n_samples)
    }
  }

  test("frame stats: one row per frame, frames differ (seed includes f)") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val fs = Multimodal.frameStats(corpus).collect()
    val perVideo = fs.groupBy(_.media_id)
    val nFrames = Multimodal.decodeHeaders(corpus).collect()
      .filter(_.kind == "video").map(d => d.media_id -> d.n_frames).toMap
    perVideo.foreach { case (id, rows) =>
      assert(rows.length.toLong == nFrames(id))
      assert(rows.map(r => (r.sum_r, r.sum_g, r.sum_b)).distinct.length > 1,
        s"frames of video $id are identical — frame seed not applied")
    }
  }

  test("resize pipeline: round-trips through real encode, 8x8 output") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val resized = Multimodal.resizeImages(corpus, 8)
    val d = Multimodal.decodeHeaders(resized).collect()
    assert(d.nonEmpty)
    assert(d.forall(x => x.width == 8L && x.height == 8L && x.meta_ok == 1L))
    // deterministic
    val a = resized.collect().sortBy(_.media_id)
    val b = Multimodal.resizeImages(corpus, 8).collect().sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) => assert(x.bytes.sameElements(y.bytes)) }
  }

  test("frame sampling emits decodable standalone BMP frames") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val sampled = Multimodal.sampleFrames(corpus, 2)
    val d = Multimodal.decodeHeaders(sampled).collect()
    assert(d.nonEmpty)
    assert(d.forall(x => x.kind == "image" && x.n_frames == 1L))
    // every other frame: stack of nf frames yields ceil(nf/2) samples
    val perVideo = sampled.groupByKey(_.media_id).count().collect().toMap
    val nf = Multimodal.decodeHeaders(corpus).collect()
      .filter(_.kind == "video").map(x => x.media_id -> x.n_frames).toMap
    perVideo.foreach { case (id, n) => assert(n == (nf(id) + 1) / 2) }
  }
}
