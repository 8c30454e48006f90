package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, MediaCodecStub, Multimodal}

/** Real javax.imageio decode behind the media-column plumbing (r12):
  * lossless PNG round-trips, analytic channel sums, and the stub
  * fallback contract for unrecognizable payloads. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    MediaCodec.encodePng(img)
  }

  test("PNG round-trip is lossless: dims and channel sums exact") {
    val bytes = png(5, 3)((x, y) => (x << 16) | (y << 8) | ((x + y) & 0xFF))
    val img = MediaCodec.decode(bytes).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    val (sr, sg, sb) = MediaCodec.channelSums(img)
    // Σx over 5×3 = 3·(0+1+2+3+4) = 30; Σy = 5·(0+1+2) = 15; Σ(x+y) = 45
    assert((sr, sg, sb) == ((30L, 15L, 45L)))
  }

  test("decode is total: null, empty, garbage, truncated PNG → None") {
    assert(MediaCodec.decode(null).isEmpty)
    assert(MediaCodec.decode(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decode("not an image at all".getBytes).isEmpty)
    assert(MediaCodec.decode(png(4, 4)((_, _) => 0).take(20)).isEmpty)
  }

  test("decodeAndFeaturize: real raster features for images, stub moments otherwise") {
    // solid mid-gray 8×4 → channel means exactly 128/255
    val bytes = png(8, 4)((_, _) => 0x808080)
    val f = MediaCodec.decodeAndFeaturize(bytes, Multimodal.featureDim)
    assert(f.length == Multimodal.featureDim)
    assert(math.abs(f(2) - 2.0f) < 1e-6, "aspect w/h = 2")
    assert(math.abs(f(3) - 128f / 255f) < 1e-6)
    assert(math.abs(f(4) - 128f / 255f) < 1e-6)
    assert(math.abs(f(5) - 128f / 255f) < 1e-6)
    // non-image payload routes to the stub byte moments — bit-identical
    val junk = "plain text payload".getBytes
    assert(MediaCodec.decodeAndFeaturize(junk, 8).toSeq ==
      MediaCodecStub.decodeAndFeaturize(junk, 8).toSeq)
  }

  test("decodeImageStats: synthetic PNGs match the analytic formulas; junk rows survive") {
    val ids = Seq(0L, 1L, 17L, 254L, 255L, 256L, 1000L).toDF("doc_id")
    val media = Multimodal.syntheticImages(ids, "doc_id")
    val stats = Multimodal.decodeImageStats(media)
      .select("media_id", "decoded", "width", "height", "channels",
        "sum_r", "sum_g", "sum_b")
      .as[(Long, Boolean, Int, Int, Int, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(stats.size == 7 && stats.values.forall(_._2))
    stats.values.foreach { case (id, _, w, h, ch, sr, sg, sb) =>
      assert(w == (8 + id % 13).toInt && h == (8 + id % 7).toInt && ch == 3)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        er += (id + x) % 256; eg += (7 * id + y) % 256
        eb += (13 * id + x + y) % 256
      }
      assert((sr, sg, sb) == ((er, eg, eb)), s"channel sums for id=$id")
    }
    // an undecodable payload yields a decoded=false zero row, not a crash
    val junk = Multimodal.fromDocuments(
      Seq((9L, "not an image")).toDF("id", "t"), "id", "t")
    val row = Multimodal.decodeImageStats(junk)
      .select("media_id", "decoded", "width")
      .as[(Long, Boolean, Int)].collect()
    assert(row.toSeq == Seq((9L, false, 0)))
  }

  test("WAV round-trip is lossless: format facts and channel sums exact") {
    val nFrames = 75; val ch = 2; val rate = 16000
    val samples = Array.tabulate[Short](nFrames * ch) { j =>
      val i = j / ch; val c = j % ch
      (((31L * 7 + 7L * i + 13L * c) % 65536) - 32768).toShort
    }
    val wav = MediaCodec.encodeWav(samples, ch, rate)
    // RIFF magic — these are real container bytes, not a raw dump
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val st = MediaCodec.decodeAudio(wav).get
    assert(st.sampleRate == rate && st.channels == ch &&
      st.nFrames == nFrames)
    val expected = Array.tabulate(ch)(c =>
      (0 until nFrames).map(i =>
        ((31L * 7 + 7L * i + 13L * c) % 65536) - 32768).sum)
    assert(st.channelSums.toSeq == expected.toSeq)
  }

  test("decodeAudio is total: null, empty, garbage, truncated WAV → None") {
    assert(MediaCodec.decodeAudio(null).isEmpty)
    assert(MediaCodec.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeAudio("not audio".getBytes).isEmpty)
    val wav = MediaCodec.encodeWav(Array[Short](1, 2, 3, 4), 1, 8000)
    assert(MediaCodec.decodeAudio(wav.take(16)).isEmpty)
    // an image payload is not audio (and vice versa: codecs don't bleed)
    assert(MediaCodec.decodeAudio(png(4, 4)((_, _) => 0)).isEmpty)
    assert(MediaCodec.decode(wav).isEmpty)
  }

  test("decodeAudioStats: synthetic WAVs match the analytic formulas; mono sum_ch1=0") {
    val ids = Seq(0L, 1L, 2L, 3L, 40L, 41L, 499L).toDF("doc_id")
    val media = Multimodal.syntheticWavs(ids, "doc_id")
    val stats = Multimodal.decodeAudioStats(media)
      .select("media_id", "decoded", "sample_rate", "channels",
        "n_frames", "sum_ch0", "sum_ch1")
      .as[(Long, Boolean, Int, Int, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(stats.size == 7 && stats.values.forall(_._2))
    stats.values.foreach { case (id, _, sr, ch, nf, s0, s1) =>
      assert(sr == (8000 * (1 + id % 3)).toInt, s"rate for id=$id")
      assert(ch == (1 + id % 2).toInt && nf == 64 + id % 41)
      def chanSum(c: Long): Long = (0L until nf).map(i =>
        ((31L * id + 7L * i + 13L * c) % 65536) - 32768).sum
      assert(s0 == chanSum(0), s"sum_ch0 for id=$id")
      assert(s1 == (if (ch == 2) chanSum(1) else 0L), s"sum_ch1 for id=$id")
    }
    // an undecodable payload yields a decoded=false zero row, not a crash
    val junk = Multimodal.fromDocuments(
      Seq((9L, "not audio")).toDF("id", "t"), "id", "t", kind = "audio")
    val row = Multimodal.decodeAudioStats(junk)
      .select("media_id", "decoded", "n_frames")
      .as[(Long, Boolean, Long)].collect()
    assert(row.toSeq == Seq((9L, false, 0L)))
  }

  test("AVI round-trip is lossless: container facts and channel sums exact") {
    val w = 11; val h = 6; val fps = 12; val nf = 4
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((f + x) % 256) << 16) | (((2 * f + y) % 256) << 8) | ((x + y) % 256)
      }
    }
    val avi = MediaCodec.encodeAvi(w, h, fps, frames)
    // RIFF/AVI magic — these are real container bytes, not a raw dump
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val st = MediaCodec.decodeVideo(avi).get
    assert(st.width == w && st.height == h && st.fps == fps &&
      st.nFrames == nf)
    def total(c: (Int, Int, Int) => Int): Long =
      (for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        yield c(f, x, y).toLong).sum
    assert(st.sumR == total((f, x, _) => (f + x) % 256))
    assert(st.sumG == total((f, _, y) => (2 * f + y) % 256))
    assert(st.sumB == total((_, x, y) => (x + y) % 256))
  }

  test("decodeVideo is total: null, empty, garbage, truncated AVI → None; codecs don't bleed") {
    assert(MediaCodec.decodeVideo(null).isEmpty)
    assert(MediaCodec.decodeVideo(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeVideo("not video at all".getBytes).isEmpty)
    val avi = MediaCodec.encodeAvi(4, 4, 10,
      Seq(Array.fill(16)(0x010203)))
    assert(MediaCodec.decodeVideo(avi.take(40)).isEmpty)
    // image/audio payloads are not video, and video is neither of those
    assert(MediaCodec.decodeVideo(png(4, 4)((_, _) => 0)).isEmpty)
    assert(MediaCodec.decodeVideo(
      MediaCodec.encodeWav(Array[Short](1, 2), 1, 8000)).isEmpty)
    assert(MediaCodec.decode(avi).isEmpty)
    assert(MediaCodec.decodeAudio(avi).isEmpty)
  }

  test("decodeVideoFrames + PNG re-encode preserves every sampled frame's raster") {
    val w = 7; val h = 5; val nf = 5
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((3 * f + x) % 256) << 16) | (((f + y) % 256) << 8) | ((5 * f + x + y) % 256)
      }
    }
    val avi = MediaCodec.encodeAvi(w, h, 10, frames)
    val sampled = MediaCodec.decodeVideoFrames(avi, stride = 2).get
    assert(sampled.map(_._1) == IndexedSeq(0, 2, 4))
    sampled.foreach { case (f, img) =>
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFFFFFF) == frames(f)(y * w + x),
          s"frame $f pixel ($x,$y)")
      // PNG round-trip (the sampleVideoFrames output format) is lossless
      val back = MediaCodec.decode(MediaCodec.encodePng(img)).get
      assert(MediaCodec.channelSums(back) == MediaCodec.channelSums(img))
    }
  }

  test("decodeVideoStats + sampleVideoFrames: synthetic AVIs match the analytic formulas") {
    val ids = Seq(0L, 1L, 2L, 3L, 8L, 44L, 499L).toDF("doc_id")
    val media = Multimodal.syntheticAvis(ids, "doc_id")
    val stats = Multimodal.decodeVideoStats(media)
      .select("media_id", "decoded", "width", "height", "fps", "n_frames",
        "sum_r", "sum_g", "sum_b")
      .as[(Long, Boolean, Int, Int, Int, Int, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(stats.size == 7 && stats.values.forall(_._2))
    stats.values.foreach { case (id, _, w, h, fps, nf, sr, sg, sb) =>
      assert(w == (8 + id % 9).toInt && h == (8 + id % 5).toInt)
      assert(nf == (3 + id % 4).toInt && fps == (10 + id % 5).toInt)
      def s(c: (Long, Long, Long) => Long): Long =
        (for (f <- 0L until nf; y <- 0L until h; x <- 0L until w)
          yield c(f, x, y)).sum
      assert(sr == s((f, x, _) => (id + 3 * f + x) % 256), s"sum_r id=$id")
      assert(sg == s((f, _, y) => (5 * id + f + y) % 256), s"sum_g id=$id")
      assert(sb == s((f, x, _) => (11 * id + 2 * f + x) % 256), s"sum_b id=$id")
    }
    // sampled arm: every 2nd frame through PNG → imageio → exact sums
    val samp = Multimodal
      .decodeImageStats(Multimodal.sampleVideoFrames(media, stride = 2))
      .groupBy("media_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("sum_r").as("sr"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(samp.size == 7)
    samp.values.foreach { case (id, n, sr) =>
      val w = 8 + id % 9; val h = 8 + id % 5; val nf = 3 + id % 4
      assert(n == (nf + 1) / 2, s"n_sampled id=$id")
      val exp = (for (f <- 0L until nf if f % 2 == 0;
                      y <- 0L until h; x <- 0L until w)
        yield (id + 3 * f + x) % 256).sum
      assert(sr == exp, s"samp_sum_r id=$id")
    }
  }

  test("short '00db' chunk: truncated frame is skipped, never read past (ADVICE r12)") {
    val w = 6; val h = 4; val nf = 3
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    // last frame all-0xFF so the walk's next "chunk header" read after
    // the shrunken chunk sees size=0xFFFFFFFF (<0) and stops cleanly
    val frames = (0 until nf).map { f =>
      if (f == nf - 1) Array.fill(w * h)(0xFFFFFF)
      else Array.tabulate(w * h)(i => ((f + i) % 256) * 0x010101)
    }
    val avi = MediaCodec.encodeAvi(w, h, 10, frames)
    // patch the LAST frame chunk's declared size one row short: a
    // parseable AVI whose final '00db' data is truncated
    val db = "00db".getBytes("US-ASCII")
    def le32At(i: Int): Int = (avi(i) & 0xFF) | ((avi(i + 1) & 0xFF) << 8) |
      ((avi(i + 2) & 0xFF) << 16) | ((avi(i + 3) & 0xFF) << 24)
    // match only movi chunk HEADERS (fourcc followed by size=frameBytes)
    // — idx1 entries also carry the '00db' fourcc, followed by flags
    val lastDb = avi.indices.reverse.find(i => i + 8 <= avi.length &&
      avi(i) == db(0) && avi(i + 1) == db(1) &&
      avi(i + 2) == db(2) && avi(i + 3) == db(3) &&
      le32At(i + 4) == frameBytes).get
    val short = frameBytes - rowBytes
    avi(lastDb + 4) = (short & 0xFF).toByte
    avi(lastDb + 5) = ((short >> 8) & 0xFF).toByte
    avi(lastDb + 6) = ((short >> 16) & 0xFF).toByte
    avi(lastDb + 7) = ((short >> 24) & 0xFF).toByte
    // frame extraction: full frames 0..nf-2 decode, the short frame is
    // SKIPPED — not emitted with garbage rows, not an array overrun
    val sampled = MediaCodec.decodeVideoFrames(avi, stride = 1).get
    assert(sampled.map(_._1) == (0 until nf - 1))
    sampled.foreach { case (f, img) =>
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFFFFFF) == frames(f)(y * w + x))
    }
    // stats arm keeps its own rows = min(h, len/rowBytes) bound: decodes
    // without error and counts the container's frame chunks
    val st = MediaCodec.decodeVideo(avi).get
    assert(st.nFrames == nf)
  }

  test("crafted strf with huge w/h: rejected, never Int-overflows into a throw (ADVICE r13)") {
    // before the parseAvi dimension bound, w or h near 2^30 overflowed
    // h*rowBytes (short-chunk guard) and w*3 (rowBytes) to negative,
    // re-admitting truncated chunks — and the decode body sits OUTSIDE
    // parseAvi's try, so the AIOOBE crashed the task instead of
    // honoring the "undecodable payloads yield no rows" contract
    val w = 6; val h = 4
    val frames = (0 until 2).map(f => Array.fill(w * h)(f * 0x010101))
    def patched(newW: Int, newH: Int): Array[Byte] = {
      val avi = MediaCodec.encodeAvi(w, h, 10, frames)
      val sf = "strf".getBytes("US-ASCII")
      val at = avi.indices.find(i => i + 16 <= avi.length &&
        avi(i) == sf(0) && avi(i + 1) == sf(1) &&
        avi(i + 2) == sf(2) && avi(i + 3) == sf(3)).get
      // BITMAPINFOHEADER after the 8-byte chunk header: biWidth at +4,
      // biHeight at +8
      def putLE32(off: Int, v: Int): Unit = {
        avi(off) = (v & 0xFF).toByte
        avi(off + 1) = ((v >> 8) & 0xFF).toByte
        avi(off + 2) = ((v >> 16) & 0xFF).toByte
        avi(off + 3) = ((v >> 24) & 0xFF).toByte
      }
      putLE32(at + 8 + 4, newW); putLE32(at + 8 + 8, newH)
      avi
    }
    // h*rowBytes overflow shape, w*3 overflow shape, and just-past-bound
    for ((pw, ph) <- Seq((6, 0x20000000), (0x20000000, 4),
        (6, 16385), (16385, 4))) {
      val avi = patched(pw, ph)
      assert(MediaCodec.decodeVideo(avi).isEmpty)
      assert(MediaCodec.decodeVideoFrames(avi, stride = 1).isEmpty)
    }
    // the unpatched container still decodes (the bound is plausibility,
    // not a behavior change for real dimensions)
    assert(MediaCodec.decodeVideo(
      MediaCodec.encodeAvi(w, h, 10, frames)).get.nFrames == 2)
  }

  test("deeply nested LISTs: parseAvi depth cap returns None instead of StackOverflowError") {
    // ~50k nested 12-byte LISTs — the crafted/corrupt shape that would
    // recurse past the JVM stack (StackOverflowError is an Error, which
    // parseAvi's `catch { case _: Exception }` does NOT absorb)
    val depth = 50000
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
      o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
    }
    def fcc(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    val inner = depth * 12
    fcc("RIFF"); le32(4 + inner); fcc("AVI ")
    var remaining = inner
    while (remaining >= 12) {
      fcc("LIST"); le32(remaining - 8); fcc("hdrl")
      remaining -= 12
    }
    val b = o.toByteArray
    assert(MediaCodec.decodeVideo(b).isEmpty)
    assert(MediaCodec.decodeVideoFrames(b, 1).isEmpty)
  }
}
