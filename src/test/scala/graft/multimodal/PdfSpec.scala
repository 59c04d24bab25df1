package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Pdf — writer/decoder round-trips across compression and operator
  * modes; hand-assembled fixtures for string escapes, hex strings,
  * TJ kerning, nested page trees, /Contents arrays, indirect /Length
  * and incremental-update /Prev chains; malformed inputs.
  */
class PdfSpec extends AnyFunSuite {

  // ------------------------------------------------------------------
  // writer round-trips
  // ------------------------------------------------------------------

  test("encode/decode round-trips: every opMode x compression x xref form") {
    val pages = Seq(Seq("hello world", "second line"), Seq("page two"))
    val want = "hello world\nsecond line\npage two"
    for (flate <- Seq(false, true); op <- 0 to 2; xs <- Seq(false, true)) {
      val got = Pdf.decode(Pdf.encode(pages, flate, op, xrefStream = xs))
      assert(got.valid, s"flate=$flate op=$op xrefStream=$xs")
      assert(got.nPages === 2, s"flate=$flate op=$op xrefStream=$xs")
      assert(got.text === want, s"flate=$flate op=$op xrefStream=$xs")
      assert(got.nChars === want.length.toLong)
    }
  }

  test("xref-stream form really exercises ObjStm + predictor-coded XRef") {
    val bytes = Pdf.encode(Seq(Seq("modern layout")), flate = true, xrefStream = true)
    val s = new String(bytes, ISO_8859_1)
    assert(s.contains("/Type /ObjStm"), "no object stream emitted")
    assert(s.contains("/Type /XRef") && s.contains("/Predictor 12"),
      "no predictor-coded xref stream emitted")
    assert(!s.contains("trailer"), "classic trailer leaked into the 1.5 layout")
    assert(Pdf.decode(bytes).text === "modern layout")
  }

  test("xref-stream /Index subsections and None predictor also decode") {
    // hand-tweak: re-encode with flate=false so the ObjStm is raw,
    // then verify the decoder's /W default-type and raw-stream paths
    val got = Pdf.decode(Pdf.encode(Seq(Seq("raw objstm"), Seq("p2")), flate = false,
      opMode = 1, xrefStream = true))
    assert(got.valid && got.nPages === 2 && got.text === "raw objstm\np2")
  }

  test("single empty page: 1 page, empty text") {
    val got = Pdf.decode(Pdf.encode(Seq(Seq.empty), flate = true))
    assert(got.valid && got.nPages === 1 && got.text === "" && got.nChars === 0L)
  }

  test("special characters survive literal-string escaping") {
    val line = """a(b)c\d (nested (parens)) end"""
    val got = Pdf.decode(Pdf.encode(Seq(Seq(line)), flate = false))
    assert(got.valid && got.text === line)
    val gotF = Pdf.decode(Pdf.encode(Seq(Seq(line)), flate = true, opMode = 1))
    assert(gotF.valid && gotF.text === line)
  }

  test("many pages walk in /Kids order") {
    val pages = (1 to 7).map(i => Seq(s"p$i"))
    val got = Pdf.decode(Pdf.encode(pages, flate = true))
    assert(got.valid && got.nPages === 7)
    assert(got.text === (1 to 7).map(i => s"p$i").mkString("\n"))
  }

  // ------------------------------------------------------------------
  // hand-assembled fixtures (decoder features the writer doesn't emit)
  // ------------------------------------------------------------------

  /** Assemble a classic-xref PDF from raw object bodies. objs(i) is
    * the body of object i+1 (between "N 0 obj\n" and "endobj\n"). */
  private def buildPdf(objs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n"); out.write(body); w("\nendobj\n")
      off
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  private def stream(dict: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"<< /Length ${data.length} $dict >>\nstream\n".getBytes(ISO_8859_1))
    bos.write(data)
    bos.write("\nendstream".getBytes(ISO_8859_1))
    bos.toByteArray
  }

  private def b(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  test("hex strings, octal escapes, \" operator, comments, T* collapse") {
    val content =
      "BT % a comment the lexer must skip\n" +
        "/F1 12 Tf 14 TL 72 720 Td\n" +
        "<48656C6C6F> Tj\n" +          // "Hello" as a hex string
        "T* T* T*\n" +                  // consecutive breaks collapse to ONE newline
        "(\\101\\102\\103) Tj\n" +      // octal escapes: "ABC"
        "1 2 (quoted) \"\n"             // " = break + show (operands aw ac string)
    val pdf = buildPdf(Seq(
      b("<< /Type /Catalog /Pages 2 0 R >>"),
      b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      stream("", b(content))))
    val got = Pdf.decode(pdf)
    assert(got.valid)
    assert(got.text === "Hello\nABC\nquoted")
  }

  test("TJ arrays concatenate strings and skip kern numbers") {
    val content = "BT [(He) -120 (llo) 50 ( wo) -3.5 (rld)] TJ ET"
    val pdf = buildPdf(Seq(
      b("<< /Type /Catalog /Pages 2 0 R >>"),
      b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      stream("", b(content))))
    assert(Pdf.decode(pdf).text === "Hello world")
  }

  test("nested /Pages tree, /Contents array, indirect /Length") {
    // page tree: root Pages -> [Pages -> [page A], page B]
    val contentA1 = b("BT (A-one) Tj ET")
    val contentA2 = b("BT (A-two) Tj ET")
    val contentB = b("BT (B) Tj ET")
    val pdf = buildPdf(Seq(
      /* 1 */ b("<< /Type /Catalog /Pages 2 0 R >>"),
      /* 2 */ b("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
      /* 3 */ b("<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
      /* 4 */ b("<< /Type /Page /Parent 3 0 R /Contents [6 0 R 7 0 R] >>"),
      /* 5 */ b("<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>"),
      /* 6 */ stream("", contentA1),
      /* 7 */ stream("", contentA2),
      /* 8 */ {
        // indirect /Length: points at object 9
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(s"<< /Length 9 0 R >>\nstream\n".getBytes(ISO_8859_1))
        bos.write(contentB)
        bos.write("\nendstream".getBytes(ISO_8859_1))
        bos.toByteArray
      },
      /* 9 */ b(s"${contentB.length}")))
    val got = Pdf.decode(pdf)
    assert(got.valid && got.nPages === 2)
    // array streams concatenate; the A2 stream's text follows A1's
    // with no break operator between, so they join on one line
    assert(got.text === "A-oneA-two\nB")
  }

  test("hybrid file: classic trailer's /XRefStm supplies the missing entries") {
    // objects 1-3 live in the classic table; the content stream (4)
    // is addressed ONLY by a companion xref stream named via
    // /XRefStm in the classic trailer — the hybrid-file layout.
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    val off = new Array[Int](6)
    def obj(n: Int, body: Array[Byte]): Unit = {
      off(n) = out.size(); w(s"$n 0 obj\n"); out.write(body); w("\nendobj\n")
    }
    obj(1, b("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    obj(3, b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"))
    obj(4, stream("", b("BT (hybrid) Tj ET")))
    // companion xref stream: entries for objects 4 and 5, W [1 2 1], no predictor
    val xs = out.size()
    val rows = Array[Byte](
      1, ((off(4) >> 8) & 0xff).toByte, (off(4) & 0xff).toByte, 0,
      1, ((xs >> 8) & 0xff).toByte, (xs & 0xff).toByte, 0)
    w(s"5 0 obj\n<< /Type /XRef /Size 6 /W [1 2 1] /Index [4 2] /Root 1 0 R " +
      s"/Length ${rows.length} >>\nstream\n")
    out.write(rows)
    w("\nendstream\nendobj\n")
    // classic table covering 0-3 only; trailer points at the stream
    val xref = out.size()
    w("xref\n0 4\n0000000000 65535 f \n")
    (1 to 3).foreach(n => w(f"${off(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R /XRefStm $xs >>\nstartxref\n$xref\n%%EOF\n")
    val got = Pdf.decode(out.toByteArray)
    assert(got.valid && got.text === "hybrid")
  }

  test("/ToUnicode CMap: shifted-code font text maps back; unmapped font reads Latin-1") {
    // font F1 stores each char as code+1; the CMap maps codes back.
    // bfrange covers b..z stored as c..{ (dst increments from 'b');
    // bfchar maps the stored codes for 'H' and ' ' explicitly.
    // font F2 has no ToUnicode — passes through as Latin-1.
    val cmap =
      ("/CIDInit /ProcSet findresource begin\n" +
        "begincmap\n" +
        "1 begincodespacerange <00> <FF> endcodespacerange\n" +
        "2 beginbfchar\n<49> <0048>\n<21> <0020>\nendbfchar\n" + // 'I'→H, '!'→' '
        "1 beginbfrange\n<63> <7B> <0062>\nendbfrange\n" +       // 'c'..'{' → 'b'..'z'
        "endcmap\nend").getBytes(ISO_8859_1)
    // "Hello world" stored shifted: H→I, rest +1, space→'!'
    def shift(s: String): String = s.map {
      case 'H' => 'I'
      case ' ' => '!'
      case c   => (c + 1).toChar
    }
    val content = s"BT /F1 12 Tf (${shift("Hello world")}) Tj " +
      s"0 -14 Td /F2 12 Tf (plain latin) Tj ET"
    val pdf = buildPdf(Seq(
      /* 1 */ b("<< /Type /Catalog /Pages 2 0 R >>"),
      /* 2 */ b("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>"), // inherited resources
      /* 3 */ b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      /* 4 */ stream("", b(content)),
      /* 5 */ b("<< /Type /Font /Subtype /Type1 /BaseFont /Sub-AAA /ToUnicode 7 0 R >>"),
      /* 6 */ b("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      /* 7 */ stream("", cmap)))
    val got = Pdf.decode(pdf)
    assert(got.valid, "ToUnicode fixture failed to decode")
    assert(got.text === "Hello world\nplain latin")
  }

  test("incremental update: /Prev chain, newest xref section wins") {
    // base document
    val base = buildPdf(Seq(
      b("<< /Type /Catalog /Pages 2 0 R >>"),
      b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      stream("", b("BT (OLD) Tj ET"))))
    // NB: lastIndexOf("xref") would match inside "startxref"
    val baseXref = new String(base, ISO_8859_1).lastIndexOf("\nxref\n") + 1
    // append a replacement object 4 + an update xref section
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val newObjOff = out.size()
    out.write("4 0 obj\n".getBytes(ISO_8859_1))
    out.write(stream("", b("BT (NEW) Tj ET")))
    out.write("\nendobj\n".getBytes(ISO_8859_1))
    val newXref = out.size()
    out.write(
      (s"xref\n4 1\n" + f"$newObjOff%010d 00000 n \n" +
        s"trailer\n<< /Size 5 /Root 1 0 R /Prev $baseXref >>\nstartxref\n$newXref\n%%EOF\n")
        .getBytes(ISO_8859_1))
    val got = Pdf.decode(out.toByteArray)
    assert(got.valid && got.text === "NEW")
  }

  test("leading position Td does not emit a newline; mid-page zero Td does not break") {
    val content = "BT 72 720 Td (x) Tj 10 0 Td (y) Tj 0 -14 Td (z) Tj ET"
    val pdf = buildPdf(Seq(
      b("<< /Type /Catalog /Pages 2 0 R >>"),
      b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      stream("", b(content))))
    // horizontal-only Td (10 0) is not a line break
    assert(Pdf.decode(pdf).text === "xy\nz")
  }

  // ------------------------------------------------------------------
  // malformed / out-of-scope inputs
  // ------------------------------------------------------------------

  test("malformed payloads yield valid=false, never an exception") {
    val good = Pdf.encode(Seq(Seq("hello")), flate = true)
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      b("not a pdf at all, just text that is long enough to pass the length gate"),
      good.take(good.length / 2),                      // truncated mid-file
      good.take(40),                                   // truncated before xref
      {
        val s = new String(good, ISO_8859_1)
        // corrupt the startxref offset
        b(s.replaceAll("startxref\n\\d+", "startxref\n999999999"))
      },
      {
        // garbage bytes labeled LZW (code beyond table → decode throws)
        buildPdf(Seq(
          b("<< /Type /Catalog /Pages 2 0 R >>"),
          b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
          b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
          stream("/Filter /LZWDecode", b("BT (x) Tj ET"))))
      },
      {
        // genuinely unsupported filter
        buildPdf(Seq(
          b("<< /Type /Catalog /Pages 2 0 R >>"),
          b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
          b("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
          stream("/Filter /JBIG2Decode", b("BT (x) Tj ET"))))
      },
      {
        // PDF 1.5 xref STREAM (startxref points at an object, not 'xref') — declared out of scope
        val s = new String(good, ISO_8859_1)
        b(s.replaceAll("startxref\n\\d+", "startxref\n9"))
      })
    cases.foreach { c =>
      val got = Pdf.decode(c)
      assert(!got.valid && got.nPages === 0 && got.text === "")
    }
  }

  test("flate stream with corrupted bytes is invalid, not an exception") {
    val good = Pdf.encode(Seq(Seq("hello world line one", "and line two")), flate = true)
    // zero out a span in the middle of the file (lands in the deflate data)
    val sIdx = new String(good, ISO_8859_1).indexOf("stream\n") + 7
    val bad = good.clone()
    (sIdx + 2 until sIdx + 10).foreach(i => bad(i) = 0)
    assert(!Pdf.decode(bad).valid)
  }

  // ------------------------------------------------------------------
  // LZW filter
  // ------------------------------------------------------------------

  test("LZW content streams round-trip: every opMode x xref form") {
    val pages = Seq(Seq("lzw compressed line", "second lzw line"), Seq("page two"))
    val want = "lzw compressed line\nsecond lzw line\npage two"
    for (op <- 0 to 2; xs <- Seq(false, true)) {
      val got = Pdf.decode(Pdf.encode(pages, flate = false, op, xrefStream = xs, lzw = true))
      assert(got.valid && got.text === want, s"op=$op xrefStream=$xs")
    }
  }

  test("lzwEncode/lzwDecode round-trips: width bumps, table reset, KwKwK") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte](7),
      "aaaaaaaaaaaaaaaa".getBytes(ISO_8859_1),             // KwKwK chains
      Array.tabulate(5000)(i => (i % 251).toByte),         // width 9→10→11
      Array.tabulate(40000)(i => ((i * 7919 + (i >> 3)) % 256).toByte), // forces a mid-stream Clear
      ("to be or not to be that is the question " * 50).getBytes(ISO_8859_1))
    cases.foreach { data =>
      val enc = Pdf.lzwEncode(data)
      assert(java.util.Arrays.equals(Pdf.lzwDecode(enc), data),
        s"round-trip failed for ${data.length} bytes")
    }
  }

  test("LZW published vector (TIFF 6.0 spec §13 example) pins both directions") {
    // TIFF 6.0 §13 worked example: input bytes 7,7,7,8,8,7,7,6,6 encode to
    // the code sequence Clear(256), 7, 258, 8, 8, 258, 6, 6, EOD(257) — an
    // external anchor for the table-build convention, independent of our
    // encoder.
    val bytes = Array[Byte](7, 7, 7, 8, 8, 7, 7, 6, 6)
    val codes = Seq(256, 7, 258, 8, 8, 258, 6, 6, 257)
    val bits = codes.map(c => ("000000000" + c.toBinaryString).takeRight(9)).mkString
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val packed = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    assert(java.util.Arrays.equals(Pdf.lzwDecode(packed), bytes))
    assert(java.util.Arrays.equals(Pdf.lzwEncode(bytes), packed))
  }

  test("LZW EarlyChange=0 DecodeParms honored; hand bit-fixture pins MSB-first 9-bit codes") {
    // hand-packed: Clear(256), 'A'(65), 'B'(66), EOD(257) as 9-bit
    // MSB-first codes = 100000000 001000001 001000010 100000001 + pad
    val bits = "100000000" + "001000001" + "001000010" + "100000001"
    val padded = bits + "0" * (8 - bits.length % 8)
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    assert(new String(Pdf.lzwDecode(data, earlyChange = true), ISO_8859_1) === "AB")
    assert(new String(Pdf.lzwDecode(data, earlyChange = false), ISO_8859_1) === "AB")
  }

  // ------------------------------------------------------------------
  // image XObjects
  // ------------------------------------------------------------------

  private def rgbSamples(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h * 3)(k => (f(k) & 0xff).toByte)

  private def sums(data: Array[Byte], comps: Int): (Long, Long, Long) =
    if (comps == 3) {
      val by = data.grouped(3).toSeq
      (by.map(p => (p(0) & 0xff).toLong).sum,
        by.map(p => (p(1) & 0xff).toLong).sum,
        by.map(p => (p(2) & 0xff).toLong).sum)
    } else {
      val s = data.map(b => (b & 0xff).toLong).sum
      (s, s, s)
    }

  test("image XObjects extract through every filter: raw, Flate, LZW, DCT") {
    val rgbRaw = rgbSamples(4, 3)(k => k * 17 + 5)
    val rgbFlate = rgbSamples(5, 2)(k => 250 - k * 7)
    val rgbLzw = rgbSamples(3, 3)(k => k * k + 1)
    val jpeg = Jpeg.encodeFlatBlocks(2, 1, (bx, _) => (100 + 50 * bx, 128, 128))
    val pdf = Pdf.encode(Seq(Seq("text with images")), flate = true, images = Seq(
      Pdf.ImageFixture(4, 3, "", rgbRaw),
      Pdf.ImageFixture(5, 2, "FlateDecode", rgbFlate),
      Pdf.ImageFixture(3, 3, "LZWDecode", rgbLzw),
      Pdf.ImageFixture(16, 8, "DCTDecode", jpeg)))
    // the text layer still extracts alongside the images
    assert(Pdf.decode(pdf).text === "text with images")
    val imgs = Pdf.decodeImages(pdf)
    assert(imgs.length === 4)
    assert(imgs.forall(_.valid))
    // fixture order is by resource name /Im0../Im3
    Seq((rgbRaw, 4, 3), (rgbFlate, 5, 2), (rgbLzw, 3, 3)).zipWithIndex.foreach {
      case ((data, w, h), i) =>
        val im = imgs(i)
        val (sr, sg, sb) = sums(data, 3)
        assert((im.width, im.height, im.nBytes) === ((w, h, w * h * 3)), s"img $i")
        assert((im.sumR, im.sumG, im.sumB) === ((sr, sg, sb)), s"img $i")
    }
    // DCT: cb=cr=128 (centered 0) → r=g=b=y exactly; flat blocks are
    // 64 copies of the block color
    val dct = imgs(3)
    assert((dct.width, dct.height, dct.nBytes) === ((16, 8, 16 * 8 * 3)))
    val wantSum = 64L * (100 + 150)
    assert((dct.sumR, dct.sumG, dct.sumB) === ((wantSum, wantSum, wantSum)))
    // and the stats agree with the Jpeg decoder's own view of the bytes
    val ji = Jpeg.decode(jpeg)
    assert((dct.sumR, dct.sumG, dct.sumB) === ((ji.sumR, ji.sumG, ji.sumB)))
  }

  test("DeviceGray images: 1 byte/pixel through Flate and DCT") {
    val gray = Array.tabulate(6 * 4)(k => (k * 11 + 3).toByte)
    val grayJpeg = Jpeg.encodeFlatBlocks(1, 1, (_, _) => (77, 128, 128))
    val pdf = Pdf.encode(Seq(Seq("gray")), flate = false, images = Seq(
      Pdf.ImageFixture(6, 4, "FlateDecode", gray, colorSpace = "DeviceGray"),
      Pdf.ImageFixture(8, 8, "DCTDecode", grayJpeg, colorSpace = "DeviceGray")))
    val imgs = Pdf.decodeImages(pdf)
    assert(imgs.length === 2 && imgs.forall(_.valid))
    val (s0, _, _) = sums(gray, 1)
    assert((imgs(0).width, imgs(0).height, imgs(0).nBytes) === ((6, 4, 24)))
    assert((imgs(0).sumR, imgs(0).sumG, imgs(0).sumB) === ((s0, s0, s0)))
    // DCT under DeviceGray: r=g=b collapses to ONE sample per pixel
    assert((imgs(1).width, imgs(1).height, imgs(1).nBytes) === ((8, 8, 64)))
    assert(imgs(1).sumR === 64L * 77)
  }

  test("bad images yield valid=false rows without hiding siblings") {
    val good = rgbSamples(2, 2)(k => k)
    val colorJpeg = Jpeg.encodeFlatBlocks(1, 1, (_, _) => (90, 200, 60)) // NOT gray
    val pdf = Pdf.encode(Seq(Seq("mixed")), flate = true, images = Seq(
      Pdf.ImageFixture(2, 2, "", good),
      Pdf.ImageFixture(9, 9, "", good), // geometry lie: 81*3 != 12 bytes
      Pdf.ImageFixture(8, 8, "DCTDecode", colorJpeg, colorSpace = "DeviceGray"),
      Pdf.ImageFixture(2, 2, "", good, colorSpace = "Indexed"))) // unsupported colorspace
    val imgs = Pdf.decodeImages(pdf)
    assert(imgs.length === 4)
    assert(imgs.map(_.valid) === Seq(true, false, false, false))
    assert(imgs(0).sumR === sums(good, 3)._1)
    assert(imgs(1) === Pdf.PdfImage(1, 0, 0, 0, 0, 0, 0, valid = false))
    // indices stay stable across invalid rows
    assert(imgs.map(_.imgIdx) === Seq(0, 1, 2, 3))
  }

  test("decodeImages: unreadable document yields empty; imageless document yields empty") {
    assert(Pdf.decodeImages(null) === Seq.empty)
    assert(Pdf.decodeImages(b("junk that is long enough to pass the gate")) === Seq.empty)
    assert(Pdf.decodeImages(Pdf.encode(Seq(Seq("no images")), flate = true)) === Seq.empty)
  }

  test("q118 synthesis shape: sanitized prefix chunks round-trip through the pdf layer") {
    // mirrors the q118 derivation exactly (40-char lines, 2 lines/page)
    val texts = Seq(
      "", "short", "x" * 40, "y" * 41,
      "The quick brown fox jumps over the lazy dog repeatedly and then some more words",
      "a" * 120 + " beyond the prefix cap")
    texts.zipWithIndex.foreach { case (t0, i) =>
      val t = t0.replaceAll("[^A-Za-z0-9 ]", "").take(120)
      val lines = t.grouped(40).toSeq.filter(_.nonEmpty)
      val pages = if (lines.isEmpty) Seq(Seq.empty[String]) else lines.grouped(2).toSeq
      val got = Pdf.decode(Pdf.encode(pages, flate = i % 2 == 0, opMode = i % 3))
      val want = lines.mkString("\n")
      assert(got.valid && got.text === want, s"case $i")
      assert(got.nPages === math.max(1, (lines.size + 1) / 2))
    }
  }
}
