package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

/** Png — hand-rolled decoder vs ImageIO round-trip; every scanline
  * filter type exercised via a hand-assembled PNG; malformed inputs.
  */
class PngSpec extends AnyFunSuite {

  private def expected(w: Int, h: Int, rgb: Array[Byte]): (Long, Long, Long, Int) = {
    var (sr, sg, sb, pk) = (0L, 0L, 0L, 0)
    for (i <- 0 until w * h) {
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b; pk = math.max(pk, math.max(r, math.max(g, b)))
    }
    (sr, sg, sb, pk)
  }

  private def pattern(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = ((x * 7 + y * 3) % 256).toByte
      rgb(p + 1) = ((x * 5 + y * 11) % 256).toByte
      rgb(p + 2) = ((x * 13 + y) % 256).toByte
    }
    rgb
  }

  test("ImageIO-encoded PNGs decode to exact pixel statistics") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 9), (33, 7))) {
      val rgb = pattern(w, h)
      val info = Png.decode(Png.encodeViaImageIO(w, h, rgb))
      val (sr, sg, sb, pk) = expected(w, h, rgb)
      assert(info.valid, s"${w}x$h: decode failed")
      assert((info.width, info.height) === ((w, h)))
      assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)))
    }
  }

  /** Assemble a PNG by hand with a CHOSEN filter type per row, by
    * forward-filtering the reference pixels — the only way to
    * guarantee all five reconstructions actually run (ImageIO picks
    * filters adaptively).
    */
  private def buildPng(w: Int, h: Int, rgb: Array[Byte], filters: Int => Int): Array[Byte] = {
    val bpp = 3; val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val recon = Array.ofDim[Int](h, stride)
    for (y <- 0 until h) {
      for (x <- 0 until stride) recon(y)(x) = rgb(y * stride + x) & 0xff
      val f = filters(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val a = if (x >= bpp) recon(y)(x - bpp) else 0
        val b = if (y > 0) recon(y - 1)(x) else 0
        val c = if (y > 0 && x >= bpp) recon(y - 1)(x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = ((recon(y)(x) - pred) & 0xff).toByte
      }
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(tmp, 0, deflater.deflate(tmp))
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(12 + data.length)
      buf.putInt(data.length).put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new CRC32()
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      buf.putInt(crc.getValue.toInt)
      buf.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", comp.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("all five scanline filter reconstructions are exact") {
    val w = 7; val h = 5
    val rgb = pattern(w, h)
    val (sr, sg, sb, pk) = expected(w, h, rgb)
    // one PNG per uniform filter, plus one cycling all five
    for (f <- 0 to 4) {
      val info = Png.decode(buildPng(w, h, rgb, _ => f))
      assert(info.valid, s"filter $f: decode failed")
      assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)),
        s"filter $f: wrong reconstruction")
    }
    val mixed = Png.decode(buildPng(w, h, rgb, y => y % 5))
    assert(mixed.valid && (mixed.sumR, mixed.sumG, mixed.sumB) === ((sr, sg, sb)))
  }

  test("malformed payloads are invalid rows, never exceptions") {
    assert(!Png.decode(null).valid)
    assert(!Png.decode(Array.emptyByteArray).valid)
    assert(!Png.decode("not a png at all, just text bytes".getBytes).valid)
    val good = Png.encodeViaImageIO(4, 4, pattern(4, 4))
    assert(!Png.decode(good.take(40)).valid, "truncated stream")
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    // corrupt deflate data must not throw (may or may not decode)
    Png.decode(corrupt)
    // grayscale / palette colour types stay on the ImageIO tier
    val gray = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    assert(!Png.decode(gray).valid, "non-truecolor must route to ImageIO tier")
  }

  test("Adam7 interlaced PNGs decode pixel-for-pixel (JDK progressive writer)") {
    // dims chosen to exercise empty and partial passes: 1x1 hits only
    // pass 1; 5x3 leaves several passes empty; larger dims hit all 7
    for ((w, h) <- Seq((1, 1), (2, 2), (5, 3), (8, 8), (16, 9), (33, 7), (13, 21))) {
      val rgb = pattern(w, h)
      val bytes = Png.encodeViaImageIO(w, h, rgb, interlaced = true)
      // the file must actually BE interlaced (IHDR byte 28 after the
      // 8-byte signature + 8-byte chunk header + 12 fields)
      assert(bytes(8 + 8 + 12) == 1, s"${w}x$h: JDK writer did not interlace")
      val got = Png.decodePixels(bytes)
      assert(got.isDefined, s"${w}x$h: interlaced decode failed")
      val (gw, gh, grgb) = got.get
      assert((gw, gh) === ((w, h)))
      assert(grgb.toSeq === rgb.toSeq,
        s"${w}x$h: de-interlaced raster differs (placement, not just sums)")
    }
  }

  test("interlaced and sequential encodings of the same image decode identically") {
    val rgb = pattern(24, 17)
    val seq = Png.decode(Png.encodeViaImageIO(24, 17, rgb))
    val adam = Png.decode(Png.encodeViaImageIO(24, 17, rgb, interlaced = true))
    assert(seq.valid && adam.valid)
    assert(seq === adam)
  }

  test("truncated interlaced streams are invalid, never exceptions") {
    val bytes = Png.encodeViaImageIO(16, 16, pattern(16, 16), interlaced = true)
    (1 until bytes.length by 11).foreach { cut =>
      Png.decode(bytes.take(cut)) // must not throw
    }
    assert(!Png.decode(bytes.take(bytes.length / 2)).valid)
  }
}
