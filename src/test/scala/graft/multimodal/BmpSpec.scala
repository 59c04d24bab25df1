package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** BMP codec: exact round-trip statistics across padded and unpadded
  * widths, malformed-payload contract, and a cross-check of our
  * decoder against the JDK's own ImageIO BMP reader on identical
  * bytes.
  */
class BmpSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = ((x * 7 + y * 3 + seed) % 256).toByte
      rgb(p + 1) = ((x * 5 + y * 11 + 2 * seed) % 256).toByte
      rgb(p + 2) = ((x * 13 + y + 3 * seed) % 256).toByte
    }
    rgb
  }

  private def expected(w: Int, h: Int, seed: Long): (Long, Long, Long, Int) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var pk = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((x * 7 + y * 3 + seed) % 256).toInt
      val g = ((x * 5 + y * 11 + 2 * seed) % 256).toInt
      val b = ((x * 13 + y + 3 * seed) % 256).toInt
      sr += r; sg += g; sb += b
      pk = math.max(pk, math.max(r, math.max(g, b)))
    }
    (sr, sg, sb, pk)
  }

  test("encode/decode round-trips exact statistics across row paddings") {
    // widths 8..11 cover all four stride paddings (0..3 bytes)
    for (w <- 8 to 11; h <- Seq(5, 6)) {
      val info = Bmp.decode(Bmp.encode(w, h, pattern(w, h, seed = w * 100 + h)))
      val (sr, sg, sb, pk) = expected(w, h, seed = w * 100 + h)
      assert(info.valid && info.width == w && info.height == h)
      assert((info.sumR, info.sumG, info.sumB, info.peak) == ((sr, sg, sb, pk)),
        s"w=$w h=$h")
    }
  }

  test("decoder agrees with the JDK ImageIO BMP reader byte-for-byte") {
    val bytes = Bmp.encode(11, 7, pattern(11, 7, seed = 42))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse our BMP output")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val argb = img.getRGB(x, y)
      sr += (argb >> 16) & 0xff; sg += (argb >> 8) & 0xff; sb += argb & 0xff
    }
    val info = Bmp.decode(bytes)
    assert(img.getWidth == info.width && img.getHeight == info.height)
    assert((sr, sg, sb) == ((info.sumR, info.sumG, info.sumB)))
  }

  test("malformed payloads yield invalid rows, never exceptions") {
    val good = Bmp.encode(8, 6, pattern(8, 6, 1))
    assert(!Bmp.decode(null).valid)
    assert(!Bmp.decode(Array.emptyByteArray).valid)
    assert(!Bmp.decode(good.take(30)).valid)              // truncated header
    assert(!Bmp.decode(good.take(60)).valid)              // truncated pixels
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(!Bmp.decode(badMagic).valid)
    val bpp32 = good.clone(); bpp32(28) = 32.toByte       // unsupported depth
    assert(!Bmp.decode(bpp32).valid)
  }
}
