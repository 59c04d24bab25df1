package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Jpeg — hand-rolled baseline decoder: cross-checked against the
  * JDK's own JPEG READER on JDK-encoded bytes (the lossy-codec analog
  * of GifSpec/PngSpec's round-trips), exactness of the DC-only
  * synthesis path that q90's oracle rebuilds arithmetically, restart
  * markers, grayscale, and malformed inputs.
  */
class JpegSpec extends AnyFunSuite {

  /** Encode a BufferedImage to JPEG bytes via the JDK writer. */
  private def imageIoJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "JDK JPEG writer unavailable")
    out.toByteArray
  }

  private def gradient(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradients compress near-losslessly, keeping the
      // decoder-vs-decoder comparison tight
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = ((x + y) * 255) / math.max(w + h - 2, 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def meanAbsDiff(a: Jpeg.Pixels, b: java.awt.image.BufferedImage): Double = {
    var sum = 0L
    var n = 0
    for (y <- 0 until a.height; x <- 0 until a.width) {
      val p = a.rgb(y * a.width + x)
      val q = b.getRGB(x, y)
      sum += math.abs(((p >> 16) & 0xff) - ((q >> 16) & 0xff))
      sum += math.abs(((p >> 8) & 0xff) - ((q >> 8) & 0xff))
      sum += math.abs((p & 0xff) - (q & 0xff))
      n += 3
    }
    sum.toDouble / n
  }

  test("JDK-encoded color JPEG decodes pixel-close to the JDK's own reader") {
    for ((w, h) <- Seq((8, 8), (16, 16), (37, 23), (64, 48))) {
      val bytes = imageIoJpeg(gradient(w, h))
      val px = Jpeg.decodePixels(bytes)
      assert(px != null, s"${w}x$h: decode failed")
      assert((px.width, px.height) === ((w, h)))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      // two independent decoders of the same lossy bytes: differences
      // are IDCT/upsampling rounding only
      val mad = meanAbsDiff(px, ref)
      assert(mad <= 3.0, s"${w}x$h: mean abs channel diff $mad vs JDK reader")
    }
  }

  test("flat-color JPEG agrees with the JDK reader within 1 per channel") {
    val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(180, 90, 40)); g2.fillRect(0, 0, 24, 16); g2.dispose()
    val bytes = imageIoJpeg(img)
    val px = Jpeg.decodePixels(bytes)
    assert(px != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(meanAbsDiff(px, ref) <= 1.0)
  }

  test("grayscale JPEG decodes with r=g=b, close to the original samples") {
    // the JDK READER is not a valid pixel reference here: it maps the
    // stored Y through a linear-gray color space (stored 12 reads back
    // as ~0 via getRGB/getSample), while JFIF Y is the sample value —
    // so compare against the raster the WRITER consumed instead
    val w = 32; val h = 20
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, 16 + (x * 4 + y * 2) % 224) // smooth, mid-range
    val bytes = imageIoJpeg(img)
    val px = Jpeg.decodePixels(bytes)
    assert(px != null)
    assert((px.width, px.height) === ((w, h)))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = px.rgb(y * w + x)
      assert(((p >> 16) & 0xff) === ((p >> 8) & 0xff))
      assert((p & 0xff) === ((p >> 8) & 0xff))
      sum += math.abs((p & 0xff) - img.getRaster.getSample(x, y, 0))
    }
    assert(sum.toDouble / (w * h) <= 4.0, s"mean abs diff ${sum.toDouble / (w * h)} vs source")
  }

  test("DC-only synthesis decodes to EXACT per-block colors (the q90 contract)") {
    val wB = 4; val hB = 3
    def colors(bx: Int, by: Int): (Int, Int, Int) =
      ((17 * bx + 29 * by + 11) % 256,
        128 + ((11 * bx + 7 * by + 3) % 97) - 48,
        128 + ((13 * bx + 5 * by + 7) % 89) - 44)
    val bytes = Jpeg.encodeFlatBlocks(wB, hB, colors)
    val px = Jpeg.decodePixels(bytes)
    assert(px != null)
    assert((px.width, px.height) === ((wB * 8, hB * 8)))
    for (y <- 0 until px.height; x <- 0 until px.width) {
      val (yv, cb, cr) = colors(x / 8, y / 8)
      val (er, eg, eb) = Jpeg.yccToRgb(yv, cb, cr)
      val p = px.rgb(y * px.width + x)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((er, eg, eb)),
        s"pixel ($x,$y) block (${x / 8},${y / 8}) ycc=($yv,$cb,$cr)")
    }
  }

  test("synthesis stats equal the oracle arithmetic across doc-id-keyed grids") {
    for (id <- Seq(0L, 1L, 5L, 42L, 499L)) {
      def colors(bx: Int, by: Int): (Int, Int, Int) =
        (((17 * bx + 29 * by + id) % 256).toInt,
          (128 + ((11 * bx + 7 * by + 3 * id) % 97) - 48).toInt,
          (128 + ((13 * bx + 5 * by + 7 * id) % 89) - 44).toInt)
      val wB = (1 + id % 4).toInt; val hB = (1 + id % 3).toInt
      val info = Jpeg.decode(Jpeg.encodeFlatBlocks(wB, hB, colors))
      var (sr, sg, sb, pk) = (0L, 0L, 0L, 0)
      for (by <- 0 until hB; bx <- 0 until wB) {
        val (yv, cb, cr) = colors(bx, by)
        val (r, g, b) = Jpeg.yccToRgb(yv, cb, cr)
        sr += 64L * r; sg += 64L * g; sb += 64L * b
        pk = math.max(pk, math.max(r, math.max(g, b)))
      }
      assert(info.valid, s"id=$id")
      assert((info.width, info.height) === ((wB * 8, hB * 8)))
      assert((info.sumR, info.sumG, info.sumB, info.peak) === ((sr, sg, sb, pk)), s"id=$id")
    }
  }

  test("DC-only synthesis survives an ImageIO re-encode cycle (real-JPEG shape)") {
    // prove the synthesized bytes are a REAL jpeg, not merely
    // self-consistent: the JDK reader must accept them and see the
    // same flat blocks (its own IDCT rounding within 1)
    def colors(bx: Int, by: Int): (Int, Int, Int) = ((40 + 20 * bx + 10 * by) % 256, 128, 128)
    val bytes = Jpeg.encodeFlatBlocks(3, 2, colors)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "JDK reader rejected synthesized JPEG")
    assert((ref.getWidth, ref.getHeight) === ((24, 16)))
    for (y <- 0 until 16; x <- 0 until 24) {
      val (yv, _, _) = colors(x / 8, y / 8)
      val got = (ref.getRGB(x, y) >> 8) & 0xff // Cb=Cr=128 → gray: g channel = Y
      assert(math.abs(got - yv) <= 1, s"($x,$y): JDK reader saw $got for Y=$yv")
    }
  }

  test("restart markers: DRI/RSTn segments decode with predictor resets") {
    // splice a DRI segment into a synthesized stream is intrusive;
    // instead encode with ImageIO after requesting restarts via a
    // low-level param if supported — otherwise synthesize manually:
    // here we verify the decoder on a hand-built two-MCU stream with
    // restartInterval=1 by patching DRI into encodeFlatBlocks output.
    def colors(bx: Int, by: Int): (Int, Int, Int) = ((100 + 30 * bx) % 256, 128, 128)
    val plain = Jpeg.encodeFlatBlocks(2, 1, colors)
    // Build the restart variant by hand: DRI(1) + per-MCU segments.
    val out = new java.io.ByteArrayOutputStream()
    // copy everything up to (not including) the SOS marker
    var sos = 2
    while (!((plain(sos) & 0xff) == 0xff && (plain(sos + 1) & 0xff) == 0xda)) sos += 1
    out.write(plain, 0, sos)
    out.write(Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 1)) // DRI: interval 1
    val sosLen = ((plain(sos + 2) & 0xff) << 8) | (plain(sos + 3) & 0xff)
    out.write(plain, sos, 2 + sosLen) // SOS header
    // entropy: MCU0 = DC diffs for (100,128,128); RST0; MCU1 with
    // RESET predictors = DC diffs for (130,128,128)
    val bits = new StringBuilder
    def putCat(diff: Int): Unit = {
      var a = math.abs(diff); var s = 0; while (a != 0) { a >>= 1; s += 1 }
      bits.append(("0000" + s.toBinaryString).takeRight(5))
      if (s > 0) {
        val v = if (diff < 0) diff + (1 << s) - 1 else diff
        bits.append((("0" * s) + v.toBinaryString).takeRight(s))
      }
      bits.append('0') // EOB
    }
    def flush(): Array[Byte] = {
      val padded = bits.toString + "1" * ((8 - bits.length % 8) % 8)
      bits.clear()
      padded.grouped(8).flatMap { g =>
        val b = Integer.parseInt(g, 2)
        if (b == 0xff) Seq(0xff.toByte, 0x00.toByte) else Seq(b.toByte)
      }.toArray
    }
    putCat(8 * (100 - 128)); putCat(0); putCat(0)
    out.write(flush())
    out.write(Array[Byte](0xff.toByte, 0xd0.toByte)) // RST0
    putCat(8 * (130 - 128)); putCat(0); putCat(0) // predictor RESET to 0
    out.write(flush())
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    val px = Jpeg.decodePixels(out.toByteArray)
    assert(px != null, "restart-interval stream failed to decode")
    assert((px.width, px.height) === ((16, 8)))
    for (y <- 0 until 8; x <- 0 until 16) {
      val expect = if (x < 8) 100 else 130
      assert(((px.rgb(y * 16 + x) >> 8) & 0xff) === expect, s"($x,$y)")
    }
  }

  test("malformed payloads yield valid=false, never an exception") {
    assert(!Jpeg.decode(null).valid)
    assert(!Jpeg.decode(Array.emptyByteArray).valid)
    assert(!Jpeg.decode(Array[Byte](1, 2, 3, 4)).valid)
    assert(!Jpeg.decode("GIF89a not a jpeg".getBytes).valid)
    val good = imageIoJpeg(gradient(16, 16))
    for (cut <- Seq(2, 4, 20, good.length / 2, good.length - 3)) {
      assert(!Jpeg.decode(java.util.Arrays.copyOf(good, cut)).valid, s"cut=$cut")
    }
    // a baseline stream RELABELED as SOF2 is malformed progressive
    // (its scan header says Ss=0, Se=63 — not a valid DC band): the
    // parser must bail out cleanly rather than mis-decode
    val prog = good.clone()
    var i = 2
    var patched = false
    while (i + 1 < prog.length && !patched) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    if (patched) assert(!Jpeg.decode(prog).valid)
  }

  // ---- progressive (SOF2) ----------------------------------------------

  /** Encode via the JDK writer in progressive mode (standard
    * multi-scan script with successive approximation).
    */
  private def imageIoProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  test("JDK-encoded PROGRESSIVE JPEG decodes pixel-close to the JDK's own reader") {
    for ((w, h) <- Seq((8, 8), (16, 16), (37, 23), (64, 48))) {
      val bytes = imageIoProgressive(gradient(w, h))
      // confirm the fixture really is SOF2 (otherwise the test proves nothing)
      val isProg = bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
      assert(isProg, s"${w}x$h: JDK writer did not emit SOF2")
      val px = Jpeg.decodePixels(bytes)
      assert(px != null, s"${w}x$h: progressive decode failed")
      assert((px.width, px.height) === ((w, h)))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val mad = meanAbsDiff(px, ref)
      assert(mad <= 3.0, s"${w}x$h: mean abs channel diff $mad vs JDK reader")
    }
  }

  test("progressive flat-block synthesis decodes EXACTLY like the baseline encoder") {
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      def colors(bx: Int, by: Int): (Int, Int, Int) =
        (((19 * bx + 23 * by + id) % 256).toInt,
          (128 + ((7 * bx + 13 * by + 5 * id) % 91) - 45).toInt,
          (128 + ((3 * bx + 17 * by + 11 * id) % 83) - 41).toInt)
      val wB = (1 + id % 3).toInt; val hB = (1 + id % 4).toInt
      val prog = Jpeg.decodePixels(Jpeg.encodeFlatBlocksProgressive(wB, hB, colors))
      val base = Jpeg.decodePixels(Jpeg.encodeFlatBlocks(wB, hB, colors))
      assert(prog != null && base != null, s"id=$id")
      assert((prog.width, prog.height) === ((base.width, base.height)))
      assert(java.util.Arrays.equals(prog.rgb, base.rgb),
        s"id=$id: progressive and baseline decodes differ")
      // and both equal the closed-form arithmetic (the q120 oracle)
      for (y <- 0 until prog.height; x <- 0 until prog.width) {
        val (yv, cb, cr) = colors(x / 8, y / 8)
        val (er, eg, eb) = Jpeg.yccToRgb(yv, cb, cr)
        val p = prog.rgb(y * prog.width + x)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((er, eg, eb)),
          s"id=$id pixel ($x,$y)")
      }
    }
  }

  test("truncated progressive streams are invalid, never exceptions") {
    def colors(bx: Int, by: Int): (Int, Int, Int) = ((50 + 31 * bx + 11 * by) % 256, 128, 128)
    val good = Jpeg.encodeFlatBlocksProgressive(3, 2, colors)
    assert(Jpeg.decode(good).valid)
    for (cut <- Seq(4, 30, good.length / 3, good.length / 2, good.length - 3))
      assert(!Jpeg.decode(java.util.Arrays.copyOf(good, cut)).valid, s"cut=$cut")
  }
}
