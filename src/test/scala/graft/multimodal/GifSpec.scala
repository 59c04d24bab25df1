package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Gif — hand-rolled LZW/container decoder vs ImageIO round-trips,
  * pixel-for-pixel cross-check against the JDK's own GIF READER,
  * code-width growth + dictionary-cap coverage, malformed inputs.
  */
class GifSpec extends AnyFunSuite {

  private def palette64(seed: Int): Array[Int] =
    Array.tabulate(64) { j =>
      (((j * 5 + seed) % 256) << 16) | (((j * 11 + 3 * seed) % 256) << 8) |
        ((j * 3 + 7 * seed) % 256)
    }

  private def pattern(w: Int, h: Int, nColors: Int): Array[Byte] = {
    val idx = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      idx(y * w + x) = ((x * 3 + y * 5) % nColors).toByte
    idx
  }

  private def expected(indices: Array[Byte], pal: Array[Int]): (Long, Long, Long, Int) = {
    var (sr, sg, sb, pk) = (0L, 0L, 0L, 0)
    indices.foreach { i =>
      val c = pal(i & 0xff)
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
      sr += r; sg += g; sb += b; pk = math.max(pk, math.max(r, math.max(g, b)))
    }
    (sr, sg, sb, pk)
  }

  test("ImageIO-encoded GIFs decode to exact pixel statistics") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 9), (33, 7))) {
      val pal = palette64(w * 31 + h)
      val idx = pattern(w, h, 64)
      val info = Gif.decode(Gif.encodeViaImageIO(w, h, idx, pal))
      val (sr, sg, sb, pk) = expected(idx, pal)
      assert(info.valid, s"${w}x$h: decode failed")
      assert((info.width, info.height) === ((w, h)))
      assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)))
    }
  }

  test("large images exercise LZW code-width growth and the 4096 dictionary cap") {
    // 128x96 = 12288 pixels with a high-entropy-ish pattern: the LZW
    // dictionary crosses every width boundary (128/256/.../2048) and
    // hits the 4096 cap, forcing the encoder to emit clear codes
    // mid-stream — all paths of the decoder's width/reset logic run
    val w = 128; val h = 96
    val pal = palette64(7)
    val idx = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      idx(y * w + x) = (((x * x + 3 * y + (x * y) % 17) % 64)).toByte
    val bytes = Gif.encodeViaImageIO(w, h, idx, pal)
    val info = Gif.decode(bytes)
    val (sr, sg, sb, pk) = expected(idx, pal)
    assert(info.valid)
    assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)))
  }

  test("decoder agrees with the JDK GIF reader pixel-for-pixel (via channel sums)") {
    val w = 19; val h = 13
    val pal = palette64(3)
    val idx = pattern(w, h, 64)
    val bytes = Gif.encodeViaImageIO(w, h, idx, pal)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var (sr, sg, sb, pk) = (0L, 0L, 0L, 0)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val c = img.getRGB(x, y)
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
      sr += r; sg += g; sb += b; pk = math.max(pk, math.max(r, math.max(g, b)))
    }
    val info = Gif.decode(bytes)
    assert((info.width, info.height) === ((img.getWidth, img.getHeight)))
    assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)),
      "hand decoder and JDK reader disagree on the same bytes")
  }

  test("small palettes (below 8-bit codes) decode exactly") {
    // 4-entry palette → the writer may emit 2-bit-index GIFs with
    // minCodeSize 2: the smallest legal LZW configuration
    val w = 9; val h = 6
    val pal = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0)
    val idx = pattern(w, h, 4)
    val info = Gif.decode(Gif.encodeViaImageIO(w, h, idx, pal))
    val (sr, sg, sb, pk) = expected(idx, pal)
    assert(info.valid)
    assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)))
  }

  test("malformed payloads are invalid rows, never exceptions") {
    assert(!Gif.decode(null).valid)
    assert(!Gif.decode(Array.emptyByteArray).valid)
    assert(!Gif.decode("GIF89a but then just text".getBytes).valid)
    assert(!Gif.decode("not a gif at all".getBytes).valid)
    val good = Gif.encodeViaImageIO(8, 8, pattern(8, 8, 4),
      Array(0x000000, 0x404040, 0x808080, 0xc0c0c0))
    assert(!Gif.decode(good.take(20)).valid, "truncated header")
    Gif.decode(good.take(good.length - 6)) // truncation mid-stream must not throw
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    Gif.decode(corrupt) // corrupt LZW data must not throw
  }

  // ---- animation walk (decodeFrames + the hand-rolled writer) ----

  private def animFixture(nf: Int, w: Int = 5, h: Int = 4):
      (Array[Int], Seq[Array[Byte]], Seq[Int]) = {
    val palette = Array.tabulate(16)(k => (k * 37 % 256 << 16) | (k * 53 % 256 << 8) | (k * 11 % 256))
    val frames = (0 until nf).map { f =>
      Array.tabulate[Byte](w * h)(i => ((i * 3 + f * 7) % 16).toByte)
    }
    val delays = (0 until nf).map(f => 4 + f * 3)
    (palette, frames, delays)
  }

  test("animated round trip: frame count, sampled stats and delay sum are exact") {
    val (palette, frames, delays) = animFixture(5)
    val bytes = Gif.encodeAnimated(5, 4, palette, frames, delays)
    val all = Gif.decodeFrames(bytes, step = 1)
    assert(all.valid && all.width == 5 && all.height == 4)
    assert(all.nFrames == 5 && all.nSampled == 5)
    assert(all.durationMs == delays.map(_ * 10L).sum)
    def frameSums(f: Array[Byte]): (Long, Long, Long) = {
      val rs = f.map(i => (palette(i & 0xff) >> 16) & 0xff).map(_.toLong).sum
      val gs = f.map(i => (palette(i & 0xff) >> 8) & 0xff).map(_.toLong).sum
      val bs = f.map(i => palette(i & 0xff) & 0xff).map(_.toLong).sum
      (rs, gs, bs)
    }
    val want = frames.map(frameSums)
    assert((all.sumR, all.sumG, all.sumB) ===
      ((want.map(_._1).sum, want.map(_._2).sum, want.map(_._3).sum)))
    // step 2 samples frames 0, 2, 4 only; duration still covers all
    val s2 = Gif.decodeFrames(bytes, step = 2)
    assert(s2.nFrames == 5 && s2.nSampled == 3)
    assert(s2.durationMs == all.durationMs)
    val sampled = Seq(0, 2, 4).map(i => want(i))
    assert((s2.sumR, s2.sumG, s2.sumB) ===
      ((sampled.map(_._1).sum, sampled.map(_._2).sum, sampled.map(_._3).sum)))
  }

  test("the JDK GIF reader accepts the hand-rolled animated writer frame-for-frame") {
    val (palette, frames, delays) = animFixture(4, w = 7, h = 3)
    val bytes = Gif.encodeAnimated(7, 3, palette, frames, delays)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 4, "JDK reader must see every frame")
    (0 until 4).foreach { f =>
      val img = reader.read(f)
      assert(img.getWidth == 7 && img.getHeight == 3)
      for (y <- 0 until 3; x <- 0 until 7) {
        val want = palette(frames(f)(y * 7 + x) & 0xff)
        assert((img.getRGB(x, y) & 0xffffff) == want,
          s"frame $f pixel ($x,$y)")
      }
    }
    reader.dispose(); iis.close()
  }

  test("a long frame exercises the literal encoder's clear-on-cap path") {
    // 70*70 = 4900 pixels > 4096: the encoder must emit a mid-stream
    // CLEAR and the decoder must resynchronize
    val palette = Array.tabulate(16)(k => k * 0x111111 / 16 * 16)
    val frame = Array.tabulate[Byte](70 * 70)(i => (i % 16).toByte)
    val bytes = Gif.encodeAnimated(70, 70, palette, Seq(frame), Seq(10))
    val v = Gif.decodeFrames(bytes)
    assert(v.valid && v.nFrames == 1)
    val wantR = frame.map(i => ((palette(i & 0xff) >> 16) & 0xff).toLong).sum
    assert(v.sumR == wantR)
  }

  test("animated malformed payloads are invalid rows, never exceptions") {
    val (palette, frames, delays) = animFixture(3)
    val good = Gif.encodeAnimated(5, 4, palette, frames, delays)
    assert(!Gif.decodeFrames(null).valid)
    assert(!Gif.decodeFrames("GIF89a junk".getBytes).valid)
    assert(!Gif.decodeFrames(good.dropRight(1)).valid, "missing trailer")
    (1 until good.length by 13).foreach(cut => Gif.decodeFrames(good.take(cut)))
    // single-frame ImageIO GIFs also walk as 1-frame animations
    val single = Gif.encodeViaImageIO(4, 4,
      Array.tabulate[Byte](16)(i => (i % 4).toByte),
      Array(0x000000, 0x404040, 0x808080, 0xc0c0c0))
    val v = Gif.decodeFrames(single)
    assert(v.valid && v.nFrames == 1 && v.nSampled == 1)
  }
}
