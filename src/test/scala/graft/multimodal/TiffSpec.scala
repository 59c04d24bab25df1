package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Tiff — own-writer round trips across the full swept configuration
  * space (byte order × compression × strips × predictor × photometric),
  * bidirectional JDK ImageIO cross-checks (their writer → our decoder
  * on table-filling noise, our writer → their reader), PackBits run
  * shapes, LZW dictionary growth through width changes, and the
  * never-throws malformed contract.
  */
class TiffSpec extends AnyFunSuite {

  private def rgbPattern(w: Int, h: Int, seed: Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      a(p) = ((x * 11 + y * 5 + seed) % 256).toByte
      a(p + 1) = ((x * 3 + y * 13 + 2 * seed) % 256).toByte
      a(p + 2) = ((x * 7 + y * 9 + 3 * seed) % 256).toByte
    }
    a
  }

  test("round trip: every byte order × compression × predictor × strip layout") {
    val (w, h) = (13, 11) // odd dims: exercises row padding-free strides
    val rgb = rgbPattern(w, h, 7)
    for {
      be <- Seq(false, true)
      comp <- Seq(1, 5, 32773)
      pred <- if (comp == 5) Seq(1, 2) else Seq(1)
      rps <- Seq(Int.MaxValue, 3, 1)
    } {
      val bytes = Tiff.encode(w, h, rgb, bigEndian = be, compression = comp,
        rowsPerStrip = rps, predictor = pred)
      val got = Tiff.decodePixels(bytes)
      assert(got.isDefined, s"be=$be comp=$comp pred=$pred rps=$rps")
      val (gw, gh, grgb) = got.get
      assert(gw === w && gh === h, s"be=$be comp=$comp")
      assert(grgb.toSeq === rgb.toSeq, s"be=$be comp=$comp pred=$pred rps=$rps")
    }
  }

  test("grayscale round trips in BOTH photometric polarities") {
    val (w, h) = (9, 6)
    val gray = Array.tabulate[Byte](w * h)(i => ((i * 37 + 5) % 256).toByte)
    for (be <- Seq(false, true); wiz <- Seq(false, true); comp <- Seq(1, 5, 32773)) {
      val bytes = Tiff.encode(w, h, gray, bigEndian = be, compression = comp,
        gray = true, whiteIsZero = wiz)
      val Some((gw, gh, rgb)) = Tiff.decodePixels(bytes)
      assert(gw === w && gh === h)
      for (i <- 0 until w * h) {
        assert((rgb(i * 3) & 0xff) === (gray(i) & 0xff), s"wiz=$wiz comp=$comp px $i")
        assert(rgb(i * 3 + 1) === rgb(i * 3) && rgb(i * 3 + 2) === rgb(i * 3))
      }
      // WhiteIsZero must actually store inverted samples (tag 262 = 0),
      // not just claim to: the two encodings differ on the wire
      if (comp == 1) {
        val plain = Tiff.encode(w, h, gray, bigEndian = be, gray = true)
        if (wiz) assert(bytes.toSeq !== plain.toSeq)
      }
    }
  }

  test("LZW survives dictionary growth through all code widths and a reset") {
    // 300×300 pseudo-noise: ~270 KB fills the 9→12-bit table many
    // times over, forcing width changes and the conservative Clear
    val (w, h) = (300, 300)
    val rgb = new Array[Byte](w * h * 3)
    var s = 12345
    for (i <- rgb.indices) { s = s * 1103515245 + 12345; rgb(i) = (s >> 16).toByte }
    for (pred <- Seq(1, 2)) {
      val bytes = Tiff.encode(w, h, rgb, compression = 5, predictor = pred, rowsPerStrip = 64)
      val Some((gw, gh, got)) = Tiff.decodePixels(bytes)
      assert(gw === w && gh === h)
      assert(java.util.Arrays.equals(got, rgb), s"pred=$pred")
    }
    // repetitive data exercises the KwKwK (code == next) path
    val rep = Array.tabulate[Byte](6000)(i => (i % 3).toByte)
    val bytes = Tiff.encode(100, 20, rep, compression = 5)
    assert(Tiff.decodePixels(bytes).get._3.toSeq === rep.toSeq)
  }

  test("PackBits handles long runs, literal tails and 128-caps") {
    val (w, h) = (130, 4) // row bytes 390 > 128: caps both run and literal lengths
    val rgb = new Array[Byte](w * h * 3)
    // row 0: all one value (long run); row 1: strictly varying
    // (literal); rows 2-3: mixed short runs
    for (x <- 0 until w * 3) rgb(x) = 42
    for (x <- 0 until w * 3) rgb(w * 3 + x) = (x * 7 + 1).toByte
    for (x <- 0 until w * 3) rgb(2 * w * 3 + x) = ((x / 5) % 256).toByte
    for (x <- 0 until w * 3) rgb(3 * w * 3 + x) = (if (x % 4 < 2) 9 else x).toByte
    val bytes = Tiff.encode(w, h, rgb, compression = 32773, rowsPerStrip = 2)
    val Some((gw, gh, got)) = Tiff.decodePixels(bytes)
    assert(gw === w && gh === h && got.toSeq === rgb.toSeq)
    // and it genuinely compresses the runs
    assert(bytes.length < rgb.length)
  }

  test("JDK ImageIO TIFF writer → our decoder (LZW + PackBits + None, RGB + gray)") {
    import javax.imageio.ImageIO
    val (w, h) = (97, 53)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var s = 999
    for (y <- 0 until h; x <- 0 until w) {
      s = s * 1103515245 + 12345
      img.setRGB(x, y, s & 0xffffff)
    }
    for (ctype <- Seq("LZW", "PackBits", "uncompressed")) {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      if (ctype == "uncompressed")
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      else {
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(ctype)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val got = Tiff.decodePixels(bos.toByteArray)
      assert(got.isDefined, s"JDK $ctype TIFF rejected")
      val (gw, gh, rgb) = got.get
      assert(gw === w && gh === h, ctype)
      for (y <- 0 until h; x <- 0 until w) {
        val exp = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert((rgb(p) & 0xff) === ((exp >> 16) & 0xff), s"$ctype r($x,$y)")
        assert((rgb(p + 1) & 0xff) === ((exp >> 8) & 0xff), s"$ctype g($x,$y)")
        assert((rgb(p + 2) & 0xff) === (exp & 0xff), s"$ctype b($x,$y)")
      }
    }
    // grayscale through the JDK writer
    // set raw raster samples (getRGB on TYPE_BYTE_GRAY applies a
    // colorspace conversion; the TIFF writer stores the raster)
    val gimg = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, (x * 31 + y * 17) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val gw2 = ImageIO.getImageWritersByFormatName("tiff").next()
    gw2.setOutput(ios)
    gw2.write(gimg)
    ios.close(); gw2.dispose()
    val got = Tiff.decodePixels(bos.toByteArray)
    assert(got.isDefined, "JDK gray TIFF rejected")
    for (y <- 0 until h; x <- 0 until w) {
      val exp = gimg.getRaster.getSample(x, y, 0)
      assert((got.get._3(((y * w + x) * 3)) & 0xff) === exp, s"gray($x,$y)")
    }
  }

  test("our writer → JDK ImageIO reader (every compression, both orders)") {
    import javax.imageio.ImageIO
    val (w, h) = (31, 22)
    val rgb = rgbPattern(w, h, 3)
    for (be <- Seq(false, true); comp <- Seq(1, 5, 32773);
         pred <- if (comp == 5) Seq(1, 2) else Seq(1)) {
      val bytes = Tiff.encode(w, h, rgb, bigEndian = be, compression = comp,
        rowsPerStrip = 4, predictor = pred)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK rejected our TIFF be=$be comp=$comp pred=$pred")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val exp = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert((rgb(p) & 0xff) === ((exp >> 16) & 0xff), s"be=$be comp=$comp r($x,$y)")
        assert((rgb(p + 1) & 0xff) === ((exp >> 8) & 0xff), s"be=$be comp=$comp g($x,$y)")
        assert((rgb(p + 2) & 0xff) === (exp & 0xff), s"be=$be comp=$comp b($x,$y)")
      }
    }
  }

  test("decode stats match a hand fold; router-visible shape") {
    val (w, h) = (5, 4)
    val rgb = rgbPattern(w, h, 1)
    val info = Tiff.decode(Tiff.encode(w, h, rgb, compression = 5))
    assert(info.valid && info.width === w && info.height === h)
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
    for (i <- 0 until w * h) {
      sr += rgb(i * 3) & 0xff; sg += rgb(i * 3 + 1) & 0xff; sb += rgb(i * 3 + 2) & 0xff
      peak = math.max(peak, math.max(rgb(i * 3) & 0xff,
        math.max(rgb(i * 3 + 1) & 0xff, rgb(i * 3 + 2) & 0xff)))
    }
    assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, peak)))
  }

  test("malformed and unsupported payloads yield invalid, never an exception") {
    val good = Tiff.encode(6, 5, rgbPattern(6, 5, 2), compression = 32773)
    assert(!Tiff.decode(null).valid)
    assert(!Tiff.decode(Array.emptyByteArray).valid)
    assert(!Tiff.decode("not a tiff at all".getBytes).valid)
    assert(!Tiff.decode(good.take(10)).valid)   // truncated header/IFD
    assert(!Tiff.decode(good.dropRight(8)).valid) // truncated strip/ifd tail
    // bad magic version
    val badVer = good.clone(); badVer(2) = 7
    assert(!Tiff.decode(badVer).valid)
    // every truncation point: never throws
    for (len <- 0 until good.length by 3)
      Tiff.decode(good.take(len))
    // random bit flips: a row or invalid, never a crash
    var s = 42
    for (_ <- 0 until 200) {
      val b = good.clone()
      s = s * 1103515245 + 12345
      val pos = math.abs(s) % b.length
      b(pos) = (b(pos) ^ (1 << (math.abs(s >> 8) % 8))).toByte
      Tiff.decode(b)
    }
  }
}
