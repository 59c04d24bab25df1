package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The crawl-scale decoder contract — "malformed payloads yield a
  * row, never an exception" — tested ADVERSARIALLY across every
  * binary decoder: seeded-random garbage, valid-magic-plus-garbage,
  * random truncations, and random byte flips of valid payloads. Any
  * result is acceptable (a flip can leave a payload decodable);
  * throwing is the only failure. Deterministic: fixed seeds, so a
  * failure reproduces exactly.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val Rounds = 300

  private def fuzz(name: String, decode: Array[Byte] => Any,
                   valid: Seq[Array[Byte]], magic: Array[Byte]): Unit = {
    val rnd = new scala.util.Random(0x5eed + name.hashCode)
    // 1. pure garbage of assorted sizes
    for (i <- 0 until Rounds) {
      val n = rnd.nextInt(if (i % 3 == 0) 64 else 4096)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      decode(b) // must not throw
    }
    // 2. right magic, garbage body
    for (_ <- 0 until Rounds) {
      val b = new Array[Byte](magic.length + rnd.nextInt(2048)); rnd.nextBytes(b)
      System.arraycopy(magic, 0, b, 0, magic.length)
      decode(b)
    }
    // 3. truncations of valid payloads at every-ish point
    valid.foreach { v =>
      for (_ <- 0 until Rounds / 3) {
        decode(java.util.Arrays.copyOf(v, rnd.nextInt(v.length)))
      }
    }
    // 4. byte flips (1-8 positions) of valid payloads
    valid.foreach { v =>
      for (_ <- 0 until Rounds) {
        val b = v.clone()
        for (_ <- 0 to rnd.nextInt(8)) {
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 + rnd.nextInt(255))).toByte
        }
        decode(b)
      }
    }
  }

  test("Pdf.decode survives garbage, truncation and bit flips") {
    val valid = Seq(
      Pdf.encode(Seq(Seq("fuzz target one", "line two"), Seq("page 2")), flate = true),
      Pdf.encode(Seq(Seq("classic raw")), flate = false, opMode = 1),
      Pdf.encode(Seq(Seq("modern layout"), Seq("next")), flate = true, opMode = 2,
        xrefStream = true))
    fuzz("pdf", Pdf.decode, valid, "%PDF-1.5\n".getBytes)
  }

  test("Jpeg.decode (baseline + progressive) survives garbage, truncation and bit flips") {
    def colors(bx: Int, by: Int): (Int, Int, Int) =
      ((37 * bx + 11 * by + 40) % 256, 120 + bx % 16, 130 + by % 16)
    val valid = Seq(
      Jpeg.encodeFlatBlocks(3, 2, colors),
      Jpeg.encodeFlatBlocksProgressive(3, 2, colors))
    fuzz("jpeg", Jpeg.decode, valid, Array(0xff.toByte, 0xd8.toByte, 0xff.toByte))
  }

  test("Png / Gif / Bmp / Wav / Mp3 survive garbage, truncation and bit flips") {
    // small valid fixtures via the encoders the suite already trusts
    val rgb = Array.tabulate(16 * 9 * 3)(i => ((i * 31) % 256).toByte)
    val png = Png.encodeViaImageIO(16, 9, rgb)
    val gifImg = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gifBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gifImg, "gif", bos); bos.toByteArray
    }
    val bmpBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gifImg, "bmp", bos); bos.toByteArray
    }
    val wav = Wav.encode(8000, Array.tabulate(64)(i => (i * 257 - 8000).toShort))
    val mp3 = Mp3.id3(14) ++ Mp3.frame(9, 0, padded = false) ++ Mp3.frame(9, 0, padded = true)
    fuzz("png", Png.decode, Seq(png), Array(0x89.toByte, 'P', 'N', 'G'))
    fuzz("gif", Gif.decode, Seq(gifBytes), "GIF89a".getBytes)
    fuzz("bmp", Bmp.decode, Seq(bmpBytes), "BM".getBytes)
    fuzz("wav", Wav.decode, Seq(wav), "RIFF".getBytes)
    fuzz("mp3", Mp3.parse, Seq(mp3), Array(0xff.toByte, 0xfb.toByte))
  }

  test("Flac.decode survives garbage, truncation and bit flips") {
    val smooth = Array.tabulate(600)(i => (4000 * math.sin(i * 0.03)).toInt)
    val valid = Seq(
      Flac.encode(8000, smooth, 256),
      Flac.encode(44100, Array.fill(100)(-7), 64),
      Flac.encode(16000, Array.tabulate(300)(i => (i * 997) % 3000 - 1500), 128))
    fuzz("flac", Flac.decode, valid, "fLaC".getBytes)
  }

  test("Warc.decode survives garbage, truncation and bit flips") {
    def rec(t: String, uri: String, st: Int, body: String) =
      Warc.WarcRecord(t, uri, st, "text/html", body)
    val valid = Seq(
      Warc.encode(Seq(rec("warcinfo", "", 0, "sw"), rec("request", "http://a", 0, ""),
        rec("response", "http://a", 200, "<p>hello fuzz</p>")), gzip = false),
      Warc.encode(Seq(rec("response", "http://b", 500, "x" * 300)), gzip = true))
    fuzz("warc", Warc.decode, valid, "WARC/1.0\r\n".getBytes)
  }

  test("Tiff.decode survives garbage, truncation and bit flips") {
    val rgb = Array.tabulate(12 * 9 * 3)(i => ((i * 53 + 7) % 256).toByte)
    val valid = Seq(
      Tiff.encode(12, 9, rgb, compression = 1, rowsPerStrip = 4),
      Tiff.encode(12, 9, rgb, bigEndian = true, compression = 5, predictor = 2),
      Tiff.encode(12, 9, rgb, compression = 32773, rowsPerStrip = 2))
    fuzz("tiff", Tiff.decode, valid, Array[Byte]('I', 'I', 0x2a, 0))
    fuzz("tiffMM", Tiff.decode, valid, Array[Byte]('M', 'M', 0, 0x2a))
  }
}
