package graft.multimodal

import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable.ArrayBuffer

/** Minimal PDF text-layer extractor — REAL decode for the reference's
  * PRIMARY input format (restaurant_etl/extractors/pdf_extractor.py:28
  * `extract_text` via pdfplumber) with zero native dependencies: the
  * classic cross-reference table, the object grammar (dicts, arrays,
  * literal/hex strings, names, numbers, indirect references), stream
  * objects with `/Filter /FlateDecode` (JDK `java.util.zip.Inflater`),
  * the page tree walk (`/Root → /Pages → /Kids`, nested `/Pages`
  * nodes, `/Contents` as a single stream or an array), and the text
  * operators of the content-stream language (`BT/ET`, `Tj`, `TJ`,
  * `'`, `"`, `Td/TD/T*`) are all fully specified public formats
  * (ISO 32000-1).
  *
  * Extraction semantics (layout-free, the pdfplumber `extract_text`
  * class of output): shown strings accumulate in reading order; a
  * line-break operator (`T*`, `'`, `"`, or `Td`/`TD` with a non-zero
  * vertical displacement) emits ONE newline before the next shown
  * string (consecutive breaks collapse; a break before any text on
  * the page is ignored — it is the initial cursor placement). Page
  * texts join with a newline. String bytes decode through the active
  * font's `/ToUnicode` CMap when it has one (bfchar/bfrange sections,
  * UTF-16BE destinations, tracked per `Tf` operator with /Resources
  * inherited down the page tree — the subset-font case real PDF
  * writers emit); fonts without one read as Latin-1, which agrees
  * with `/WinAnsiEncoding` on the printable-ASCII range this
  * engine's corpus uses.
  *
  * Both cross-reference forms are supported: the classic `xref`
  * table AND PDF 1.5+ cross-reference STREAMS (/Type /XRef — W-field
  * rows, /Index subsections, FlateDecode, PNG Up/None predictors via
  * /DecodeParms) with OBJECT STREAMS (/Type /ObjStm — compressed
  * non-stream objects addressed by type-2 entries), plus hybrid
  * files (/XRefStm in a classic trailer). Incremental updates via
  * `/Prev` chains are followed in both forms. Stream filters:
  * FlateDecode, LZWDecode (ISO 32000-1 §7.4.4 TIFF-variant with
  * EarlyChange) and DCTDecode (the in-repo [[Jpeg]] decoder), as a
  * chain, each with its own /DecodeParms predictor. [[decodeImages]]
  * walks the page tree's /XObject /Subtype /Image entries through
  * the same filter path. Scope boundaries (→ `valid=false`, never an
  * exception — the crawl-scale contract shared by every decoder in
  * this package): encryption, filters beyond those three.
  *
  * The [[encode]] side is the established oracle pattern (q70/q80/q83/
  * q90/q94): synthesize documents with our own writer — uncompressed
  * or Flate content streams, three distinct text-operator styles —
  * whose extracted text an SQL oracle reconstructs from the source
  * column without ever seeing a PDF byte, so the q118 hash match
  * proves the xref walk, inflate, and operator handling end to end.
  */
object Pdf {

  /** `valid=false` rows carry zeros/empty (malformed payloads yield a
    * row, never an exception).
    */
  final case class PdfText(nPages: Int, nChars: Long, text: String, valid: Boolean)

  private val Invalid = PdfText(0, 0L, "", valid = false)

  // ------------------------------------------------------------------
  // Writer (fixture/synthesis side)
  // ------------------------------------------------------------------

  /** Escape a PDF literal string: `\ ( )` are the only specials for
    * the printable-ASCII payloads this engine synthesizes. */
  private[multimodal] def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 4)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** One page's content stream. `opMode` exercises distinct operator
    * shapes that must extract identically:
    *  0 — `(line) Tj` with explicit `0 -14 Td` breaks;
    *  1 — `[(a) -120 (b)] TJ` kerned arrays (numbers are horizontal
    *      adjustments, NOT breaks — the decoder must skip them);
    *  2 — first line `Tj`, then `(line) '` (move-and-show).
    */
  private def contentStream(lines: Seq[String], opMode: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (ln, j) =>
      if (j > 0 && opMode != 2) sb.append("0 -14 Td\n")
      opMode match {
        case 1 =>
          val (a, b) = ln.splitAt(ln.length / 2)
          sb.append(s"[(${esc(a)}) -120 (${esc(b)})] TJ\n")
        case 2 =>
          if (j == 0) sb.append(s"(${esc(ln)}) Tj\n")
          else sb.append(s"(${esc(ln)}) '\n")
        case _ =>
          sb.append(s"(${esc(ln)}) Tj\n")
      }
    }
    sb.append("ET\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  private[multimodal] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](math.max(256, data.length + 64))
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) { val n = d.deflate(buf); bos.write(buf, 0, n) }
    d.end()
    bos.toByteArray
  }

  /** An image to embed as a /Subtype /Image XObject on the first
    * page. `filter` is "DCTDecode" (`data` = a complete JPEG),
    * "FlateDecode" or "LZWDecode" (`data` = raw 8-bit samples,
    * compressed by the writer), or "" (raw, stored). `colorSpace`
    * is "DeviceRGB" (3 samples/px) or "DeviceGray" (1 sample/px).
    */
  final case class ImageFixture(width: Int, height: Int, filter: String,
                                data: Array[Byte], colorSpace: String = "DeviceRGB")

  /** Build a complete PDF: one content stream per page (optionally
    * FlateDecode- or LZWDecode-compressed), a shared Type1 font, and
    * either a classic byte-offset xref table + trailer or
    * (xrefStream=true) a PDF 1.5 layout — the non-stream objects
    * packed into an OBJECT STREAM addressed by type-2 entries of a
    * cross-reference STREAM whose row data is FlateDecode +
    * PNG-Up-predictor coded (the form modern writers emit). `images`
    * become XObjects on the first page (classic layout only).
    */
  def encode(pages: Seq[Seq[String]], flate: Boolean, opMode: Int = 0,
             xrefStream: Boolean = false, lzw: Boolean = false,
             images: Seq[ImageFixture] = Nil): Array[Byte] =
    if (xrefStream) {
      require(images.isEmpty, "image fixtures use the classic layout")
      encodeXrefStream(pages, flate, opMode, lzw)
    } else encodeClassic(pages, flate, opMode, lzw, images)

  private def packStream(raw: Array[Byte], flate: Boolean, lzw: Boolean): (Array[Byte], String) =
    if (lzw) (lzwEncode(raw), " /Filter /LZWDecode")
    else if (flate) (deflate(raw), " /Filter /FlateDecode")
    else (raw, "")

  private def encodeClassic(pages: Seq[Seq[String]], flate: Boolean, opMode: Int,
                            lzw: Boolean, images: Seq[ImageFixture]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val nPages = pages.size
    val imgBase = 3 + 2 * nPages // image objects follow the (page, content) pairs
    val nObjs = imgBase + images.size
    val offsets = new Array[Long](nObjs + 1)
    w("%PDF-1.4\n")
    // conventional binary-content marker comment
    out.write(Array[Byte]('%', 0xE2.toByte, 0xE3.toByte, 0xCF.toByte, 0xD3.toByte, '\n'))
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = out.size().toLong; w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(2) { w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n") }
    obj(3) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\n") }
    val xobjRes =
      if (images.isEmpty) ""
      else " /XObject << " + images.indices.map(i => s"/Im$i ${imgBase + 1 + i} 0 R")
        .mkString(" ") + " >>"
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 4 + 2 * i; val contObj = 5 + 2 * i
      obj(pageObj) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >>${if (i == 0) xobjRes else ""} >> " +
          s"/Contents $contObj 0 R >>\n")
      }
      val (data, filterEntry) = packStream(contentStream(lines, opMode), flate, lzw)
      obj(contObj) {
        w(s"<< /Length ${data.length}$filterEntry >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    images.zipWithIndex.foreach { case (img, i) =>
      val data = img.filter match {
        case "FlateDecode" => deflate(img.data)
        case "LZWDecode"   => lzwEncode(img.data)
        case _             => img.data // DCTDecode payloads ship verbatim; "" stores raw
      }
      obj(imgBase + 1 + i) {
        w(s"<< /Type /XObject /Subtype /Image /Width ${img.width} /Height ${img.height} " +
          s"/ColorSpace /${img.colorSpace} /BitsPerComponent 8 " +
          (if (img.filter.nonEmpty) s"/Filter /${img.filter} " else "") +
          s"/Length ${data.length} >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n")
    w("%%EOF\n")
    out.toByteArray
  }

  private def encodeXrefStream(pages: Seq[Seq[String]], flate: Boolean, opMode: Int,
                               lzw: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val nPages = pages.size
    val nObjs = 3 + 2 * nPages
    val objStmNum = nObjs + 1
    val xrefNum = nObjs + 2
    val offsets = new Array[Long](nObjs + 3)
    w("%PDF-1.5\n")
    out.write(Array[Byte]('%', 0xE2.toByte, 0xE3.toByte, 0xCF.toByte, 0xD3.toByte, '\n'))

    // content streams stay regular objects (streams may not live in
    // an object stream)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val contObj = 5 + 2 * i
      val (data, filterEntry) = packStream(contentStream(lines, opMode), flate, lzw)
      offsets(contObj) = out.size().toLong
      w(s"$contObj 0 obj\n<< /Length ${data.length}$filterEntry >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }

    // the catalog, page tree, font and page dicts go into ONE object stream
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    val inStm: Seq[(Int, String)] =
      Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $nPages >>",
        3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>") ++
        (0 until nPages).map { i =>
          (4 + 2 * i) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
        }
    val bodies = inStm.map(_._2 + "\n")
    val bodyOffs = bodies.scanLeft(0)(_ + _.length)
    val header = inStm.zip(bodyOffs).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString).getBytes(ISO_8859_1)
    val stmData = if (flate) deflate(payload) else payload
    offsets(objStmNum) = out.size().toLong
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${inStm.size} /First ${header.length} " +
      s"/Length ${stmData.length}" + (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")

    // cross-reference stream: W [1 4 2], PNG Up predictor + Flate
    val xrefOff = out.size()
    offsets(xrefNum) = xrefOff.toLong
    val size = nObjs + 3
    val typ2 = inStm.map(_._1).zipWithIndex.toMap
    val cols = 7 // 1 + 4 + 2
    val rows = new Array[Byte](size * cols)
    def putRow(n: Int, t: Int, f2: Long, f3: Int): Unit = {
      val o = n * cols
      rows(o) = t.toByte
      rows(o + 1) = ((f2 >> 24) & 0xff).toByte
      rows(o + 2) = ((f2 >> 16) & 0xff).toByte
      rows(o + 3) = ((f2 >> 8) & 0xff).toByte
      rows(o + 4) = (f2 & 0xff).toByte
      rows(o + 5) = ((f3 >> 8) & 0xff).toByte
      rows(o + 6) = (f3 & 0xff).toByte
    }
    putRow(0, 0, 0L, 0xffff)
    (1 until size).foreach { n =>
      typ2.get(n) match {
        case Some(idx) => putRow(n, 2, objStmNum.toLong, idx)
        case None      => putRow(n, 1, offsets(n), 0)
      }
    }
    // forward Up filter: row := row - previous row (mod 256)
    val pred = new Array[Byte](size * (cols + 1))
    var r = 0
    while (r < size) {
      pred(r * (cols + 1)) = 2 // Up
      var i = 0
      while (i < cols) {
        val cur = rows(r * cols + i) & 0xff
        val up = if (r > 0) rows((r - 1) * cols + i) & 0xff else 0
        pred(r * (cols + 1) + 1 + i) = ((cur - up) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val xdata = deflate(pred)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> " +
      s"/Length ${xdata.length} >>\nstream\n")
    out.write(xdata)
    w(s"\nendstream\nendobj\nstartxref\n$xrefOff\n")
    w("%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Object grammar
  // ------------------------------------------------------------------

  private sealed trait PVal
  private final case class PNum(v: Double) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PStr(v: String) extends PVal
  private final case class PArr(v: Vector[PVal]) extends PVal
  private final case class PDict(v: Map[String, PVal]) extends PVal
  private final case class PRef(num: Int) extends PVal
  private final case class PBool(v: Boolean) extends PVal
  private case object PNull extends PVal

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Byte-level tokenizer/parser over one region of the file. */
  private final class Lexer(val b: Array[Byte], var p: Int) {
    def eof: Boolean = p >= b.length
    def peek: Int = if (eof) -1 else b(p) & 0xff

    def ws(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (isWs(c)) p += 1
        else if (c == '%') { while (!eof && peek != '\n' && peek != '\r') p += 1 }
        else go = false
      }
    }

    /** Regular-character run (operator / keyword / number token). */
    def keyword(): String = {
      ws()
      val s = p
      while (!eof && !isWs(peek) && !isDelim(peek)) p += 1
      new String(b, s, p - s, ISO_8859_1)
    }

    def expect(k: String): Unit = {
      val got = keyword()
      if (got != k) throw new IllegalArgumentException(s"expected '$k', got '$got'")
    }

    def name(): String = {
      // caller consumed '/'
      val s = p
      while (!eof && !isWs(peek) && !isDelim(peek)) p += 1
      val raw = new String(b, s, p - s, ISO_8859_1)
      // #xx hex escapes in names
      if (!raw.contains('#')) raw
      else {
        val sb = new StringBuilder; var i = 0
        while (i < raw.length) {
          if (raw(i) == '#' && i + 2 < raw.length) {
            sb.append(Integer.parseInt(raw.substring(i + 1, i + 3), 16).toChar); i += 3
          } else { sb.append(raw(i)); i += 1 }
        }
        sb.toString
      }
    }

    def literalString(): String = {
      // caller consumed '('
      val sb = new StringBuilder
      var depth = 1
      while (depth > 0) {
        if (eof) throw new IllegalArgumentException("unterminated string")
        val c = b(p) & 0xff; p += 1
        c match {
          case '\\' =>
            if (eof) throw new IllegalArgumentException("dangling escape")
            val e = b(p) & 0xff; p += 1
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case '\r' => if (!eof && peek == '\n') p += 1 // line continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && !eof && peek >= '0' && peek <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                sb.append((v & 0xff).toChar)
              case other => sb.append(other.toChar)
            }
          case '(' => depth += 1; sb.append('(')
          case ')' => depth -= 1; if (depth > 0) sb.append(')')
          case other => sb.append(other.toChar)
        }
      }
      sb.toString
    }

    def hexString(): String = {
      // caller consumed '<'
      val sb = new StringBuilder
      val hex = new StringBuilder
      var done = false
      while (!done) {
        if (eof) throw new IllegalArgumentException("unterminated hex string")
        val c = b(p) & 0xff; p += 1
        if (c == '>') done = true
        else if (!isWs(c)) hex.append(c.toChar)
      }
      if (hex.length % 2 == 1) hex.append('0')
      var i = 0
      while (i < hex.length) {
        sb.append(Integer.parseInt(hex.substring(i, i + 2), 16).toChar); i += 2
      }
      sb.toString
    }

    def value(): PVal = {
      ws()
      if (eof) throw new IllegalArgumentException("eof in value")
      val c = peek
      if (c == '<') {
        if (p + 1 < b.length && (b(p + 1) & 0xff) == '<') {
          p += 2
          var m = Map.empty[String, PVal]
          var done = false
          while (!done) {
            ws()
            if (peek == '>') { p += 2; done = true }
            else if (peek == '/') { p += 1; val k = name(); m += (k -> value()) }
            else throw new IllegalArgumentException(s"bad dict entry at $p")
          }
          PDict(m)
        } else { p += 1; PStr(hexString()) }
      } else if (c == '(') { p += 1; PStr(literalString()) }
      else if (c == '/') { p += 1; PName(name()) }
      else if (c == '[') {
        p += 1
        val xs = Vector.newBuilder[PVal]
        var done = false
        while (!done) {
          ws()
          if (peek == ']') { p += 1; done = true } else xs += value()
        }
        PArr(xs.result())
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val save = p
        val tok = keyword()
        val n = tok.toDouble
        // "num gen R" lookahead → indirect reference
        if (n >= 0 && n == n.floor) {
          val save2 = p
          try {
            ws()
            val g = keyword()
            ws()
            if (g.nonEmpty && g.forall(_.isDigit) && peek == 'R') {
              val save3 = p
              val r = keyword()
              if (r == "R") return PRef(n.toInt) else { p = save3 }
            }
            p = save2
          } catch { case _: Exception => p = save2 }
        }
        val _ = save
        PNum(n)
      } else {
        keyword() match {
          case "true"  => PBool(true)
          case "false" => PBool(false)
          case "null"  => PNull
          case other   => throw new IllegalArgumentException(s"bad token '$other'")
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Document structure
  // ------------------------------------------------------------------

  /** Xref entries: direct byte offsets + type-2 compressed locations
    * (object → (containing object stream, index within it)). */
  private final case class Xref(offsets: Map[Int, Int], compressed: Map[Int, (Int, Int)])

  private final class Doc(bytes: Array[Byte], xref: Xref) {
    private val cache = scala.collection.mutable.Map.empty[Int, (PVal, Option[Array[Byte]])]
    private val stmCache = scala.collection.mutable.Map.empty[Int, (Map[Int, Int], Array[Byte], Int)]

    def resolve(v: PVal): PVal = v match {
      case PRef(n) => obj(n)._1
      case other   => other
    }

    /** Parse object n: its value and, for stream objects, the RAW
      * (still-encoded) stream bytes. Type-2 (object-stream) entries
      * parse out of the decompressed container. */
    def obj(n: Int): (PVal, Option[Array[Byte]]) = cache.getOrElseUpdate(n, {
      xref.offsets.get(n) match {
        case Some(off) =>
          val lex = new Lexer(bytes, off)
          val num = lex.keyword()
          if (num.toInt != n) throw new IllegalArgumentException(s"xref points obj $n at obj $num")
          lex.keyword() // generation number
          lex.expect("obj")
          val v = lex.value()
          lex.ws()
          val save = lex.p
          val kw = lex.keyword()
          if (kw == "stream") {
            // EOL after 'stream': CRLF or LF
            if (lex.peek == '\r') lex.p += 1
            if (lex.peek == '\n') lex.p += 1
            val len = resolve(v.asInstanceOf[PDict].v.getOrElse("Length",
              throw new IllegalArgumentException("stream without /Length"))) match {
              case PNum(x) => x.toInt
              case other   => throw new IllegalArgumentException(s"bad /Length $other")
            }
            if (len < 0 || lex.p + len > bytes.length)
              throw new IllegalArgumentException("stream overruns file")
            val data = java.util.Arrays.copyOfRange(bytes, lex.p, lex.p + len)
            (v, Some(data))
          } else {
            lex.p = save
            (v, None)
          }
        case None =>
          val (stm, _) = xref.compressed.getOrElse(n,
            throw new IllegalArgumentException(s"no xref entry for obj $n"))
          val (index, data, first) = objStm(stm)
          val off = index.getOrElse(n,
            throw new IllegalArgumentException(s"obj $n not in objstm $stm"))
          (new Lexer(data, first + off).value(), None)
      }
    })

    /** Load + cache an object stream: (objnum → offset, decoded data, /First). */
    private def objStm(stm: Int): (Map[Int, Int], Array[Byte], Int) =
      stmCache.getOrElseUpdate(stm, {
        val dict = obj(stm)._1.asInstanceOf[PDict].v
        if (resolve(dict.getOrElse("Type", PNull)) != PName("ObjStm"))
          throw new IllegalArgumentException(s"obj $stm is not an object stream")
        val n = resolve(dict.getOrElse("N", PNull)) match {
          case PNum(x) => x.toInt; case o => throw new IllegalArgumentException(s"bad /N $o")
        }
        val first = resolve(dict.getOrElse("First", PNull)) match {
          case PNum(x) => x.toInt; case o => throw new IllegalArgumentException(s"bad /First $o")
        }
        val data = streamData(stm)
        val lex = new Lexer(data, 0)
        val pairs = (0 until n).map { _ =>
          val num = lex.keyword().toInt
          val off = lex.keyword().toInt
          num -> off
        }.toMap
        (pairs, data, first)
      })

    /** Decoded stream payload of object n, applying /Filter (and any
      * /DecodeParms predictor). */
    def streamData(n: Int): Array[Byte] = {
      val (v, raw) = obj(n)
      val data = raw.getOrElse(throw new IllegalArgumentException(s"obj $n is not a stream"))
      applyFilters(v.asInstanceOf[PDict].v, data, resolve)
    }
  }

  /** Apply the /Filter CHAIN in order — FlateDecode, LZWDecode (ISO
    * 32000-1 §7.4.4, the TIFF LZW variant with the EarlyChange parm),
    * DCTDecode (the Jpeg decoder; output is the decoded RGB sample
    * data) — each with its own /DecodeParms entry (PNG predictors,
    * EarlyChange). A single name and a one-element array are the
    * common real-world forms; multi-filter chains fold left.
    */
  private def applyFilters(dict: Map[String, PVal], data: Array[Byte],
                           resolve: PVal => PVal): Array[Byte] = {
    val filters: Seq[PVal] = dict.get("Filter").map(resolve) match {
      case None           => Seq.empty
      case Some(n: PName) => Seq(n)
      case Some(PArr(v))  => v.map(resolve)
      case Some(other)    => throw new IllegalArgumentException(s"bad /Filter $other")
    }
    val parmsList: Seq[Map[String, PVal]] = dict.get("DecodeParms").map(resolve) match {
      case Some(PDict(m)) => Seq(m)
      case Some(PArr(v)) => v.map(resolve).map {
        case PDict(m) => m
        case _        => Map.empty[String, PVal]
      }
      case _ => Seq.empty
    }
    filters.zipWithIndex.foldLeft(data) { case (d, (f, i)) =>
      val parms = if (i < parmsList.length) parmsList(i) else Map.empty[String, PVal]
      f match {
        case PName("FlateDecode") => unpredict(parms, inflate(d), resolve)
        case PName("LZWDecode") =>
          unpredict(parms, lzwDecode(d, intParm(parms, "EarlyChange", resolve, 1) != 0), resolve)
        case PName("DCTDecode") =>
          val px = Jpeg.decodePixels(d)
          if (px == null) throw new IllegalArgumentException("bad DCTDecode payload")
          // emit samples at the stream's DECLARED component count —
          // a /DeviceGray stream must not silently yield 3-byte RGB
          // (the consumer sizes buffers by Width*Height*components)
          resolve(dict.getOrElse("ColorSpace", PNull)) match {
            case PName("DeviceRGB") | PNull => // absent → the decoder's native RGB
              val out = new Array[Byte](px.rgb.length * 3)
              var j = 0
              while (j < px.rgb.length) {
                val p = px.rgb(j)
                out(3 * j) = ((p >> 16) & 0xff).toByte
                out(3 * j + 1) = ((p >> 8) & 0xff).toByte
                out(3 * j + 2) = (p & 0xff).toByte
                j += 1
              }
              out
            case PName("DeviceGray") =>
              // a grayscale JPEG decodes with r=g=b exactly; anything
              // else under a /DeviceGray label is malformed
              val out = new Array[Byte](px.rgb.length)
              var j = 0
              while (j < px.rgb.length) {
                val p = px.rgb(j)
                val r = (p >> 16) & 0xff
                if (r != ((p >> 8) & 0xff) || r != (p & 0xff))
                  throw new IllegalArgumentException("color JPEG under /DeviceGray")
                out(j) = r.toByte
                j += 1
              }
              out
            case other =>
              throw new IllegalArgumentException(s"unsupported DCT colorspace $other")
          }
        case other => throw new IllegalArgumentException(s"unsupported filter $other")
      }
    }
  }

  private def intParm(parms: Map[String, PVal], key: String,
                      resolve: PVal => PVal, dflt: Int): Int =
    parms.get(key).map(resolve) match {
      case Some(PNum(x)) => x.toInt
      case _             => dflt
    }

  /** Undo the /DecodeParms predictor on one filter's output. */
  private def unpredict(parms: Map[String, PVal], inflated: Array[Byte],
                        resolve: PVal => PVal): Array[Byte] = {
    val predictor = intParm(parms, "Predictor", resolve, 1)
    if (predictor <= 1) inflated
    else if (predictor >= 10) {
      // PNG predictors, bpp = 1 (Colors=1, BitsPerComponent=8 — the
      // xref-stream case): each row = 1 filter byte + Columns bytes
      val cols = parms.get("Columns").map(resolve) match {
        case Some(PNum(x)) => x.toInt
        case _             => 1
      }
      if (cols <= 0 || inflated.length % (cols + 1) != 0)
        throw new IllegalArgumentException("bad predictor geometry")
      val rows = inflated.length / (cols + 1)
      val out = new Array[Byte](rows * cols)
      var r = 0
      while (r < rows) {
        val ft = inflated(r * (cols + 1)) & 0xff
        var i = 0
        while (i < cols) {
          val x = inflated(r * (cols + 1) + 1 + i) & 0xff
          val left = if (i > 0) out(r * cols + i - 1) & 0xff else 0
          val up = if (r > 0) out((r - 1) * cols + i) & 0xff else 0
          val ul = if (r > 0 && i > 0) out((r - 1) * cols + i - 1) & 0xff else 0
          val v = ft match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + ((left + up) >> 1)
            case 4 => // Paeth
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => throw new IllegalArgumentException(s"bad PNG filter $ft")
          }
          out(r * cols + i) = (v & 0xff).toByte
          i += 1
        }
        r += 1
      }
      out
    } else throw new IllegalArgumentException(s"unsupported predictor $predictor")
  }

  private val LzwClear = 256
  private val LzwEod = 257

  /** PDF LZWDecode (ISO 32000-1 §7.4.4 — the TIFF variant): MSB-first
    * bit packing, 9-bit initial codes, 256 = Clear / 257 = EOD, table
    * reset on Clear; `earlyChange` (the spec default) bumps the code
    * width one table entry before the index arithmetic requires it.
    * Output length is unknown up front (unlike the TIFF strip case),
    * so the table expands into a growable buffer.
    */
  private[multimodal] def lzwDecode(data: Array[Byte], earlyChange: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0L
    val bitEnd = data.length.toLong * 8
    val bump = if (earlyChange) 1 else 0
    def read(): Int = {
      if (bitPos + width > bitEnd)
        throw new IllegalArgumentException("lzw bit underrun")
      var v = 0
      var i = 0
      while (i < width) {
        v = (v << 1) | ((data((bitPos >> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    def emit(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= 258) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        if (sp >= stack.length) throw new IllegalArgumentException("lzw cycle")
      }
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp) & 0xff) }
      c.toByte
    }
    var oldCode = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == LzwEod) done = true
      else if (code == LzwClear) { next = 258; width = 9; oldCode = -1 }
      else if (oldCode == -1) {
        if (code >= 256) throw new IllegalArgumentException("lzw first code not literal")
        emit(code)
        oldCode = code
      } else {
        if (code > next) throw new IllegalArgumentException("lzw code beyond table")
        if (code == next) { // KwKwK: string = old + firstByte(old)
          if (next >= 4096) throw new IllegalArgumentException("lzw table overflow")
          var c = oldCode
          while (c >= 258) c = prefix(c)
          prefix(next) = oldCode; suffix(next) = c.toByte
          next += 1
          if (next + bump == (1 << width) && width < 12) width += 1
          emit(code)
        } else {
          val f = emit(code)
          if (next < 4096) {
            prefix(next) = oldCode; suffix(next) = f
            next += 1
            if (next + bump == (1 << width) && width < 12) width += 1
          }
        }
        oldCode = code
      }
    }
    out.toByteArray
  }

  /** LZW encoder (writer/fixture side, early-change variant — the
    * form [[lzwDecode]]'s defaults read back). Emits Clear up front,
    * resets the table before it fills, ends with EOD.
    */
  private[multimodal] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = 258
    put(LzwClear)
    var cur = -1
    for (b0 <- data) {
      val b = b0 & 0xff
      if (cur < 0) cur = b
      else table.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          if (next >= 4095) { // table full: restart the dictionary
            put(LzwClear)
            table.clear(); next = 258; width = 9
          } else {
            table((cur, b)) = next
            next += 1
            // The decoder's table lags this one by a single entry at the same
            // stream position, so with early change the width must flip one
            // entry LATER here than lzwDecode's next+1==1<<width trigger.
            if (next == (1 << width) && width < 12) width += 1
          }
          cur = b
      }
    }
    if (cur >= 0) put(cur)
    put(LzwEod)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val bos = new java.io.ByteArrayOutputStream()
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate stream")
      bos.write(buf, 0, n)
    }
    inf.end()
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Cross-reference table
  // ------------------------------------------------------------------

  /** Parse the xref chain (classic tables, PDF 1.5 xref streams, or
    * hybrid /XRefStm) starting at `startxref`; returns the merged
    * entries and the trailer of the NEWEST section — whose /Root
    * wins, per the incremental-update rules. First-seen entries win
    * (we follow /Prev backwards, newest first). */
  private def readXref(bytes: Array[Byte], startOff: Int): (Xref, Map[String, PVal]) = {
    var offsets = Map.empty[Int, Int]
    var compressed = Map.empty[Int, (Int, Int)]
    var trailer0: Option[Map[String, PVal]] = None
    var next: Option[Int] = Some(startOff)
    var hops = 0

    def add(n: Int, typ: Int, f2: Int, f3: Int): Unit =
      if (!offsets.contains(n) && !compressed.contains(n)) {
        if (typ == 1) offsets += (n -> f2)
        else if (typ == 2) compressed += (n -> ((f2, f3)))
        // type 0 = free: skip
      }

    /** XRef STREAM at `off`: parse the object inline (no Doc yet),
      * decode W-field rows over the /Index subsections. Returns its
      * dict (doubles as the trailer). */
    def readXrefStream(off: Int): Map[String, PVal] = {
      val lex = new Lexer(bytes, off)
      lex.keyword(); lex.keyword(); lex.expect("obj")
      val dict = lex.value() match {
        case PDict(m) => m
        case other    => throw new IllegalArgumentException(s"xref stream is $other")
      }
      lex.ws(); lex.expect("stream")
      if (lex.peek == '\r') lex.p += 1
      if (lex.peek == '\n') lex.p += 1
      val len = dict.getOrElse("Length", PNull) match {
        case PNum(x) => x.toInt // indirect /Length here is chicken-and-egg: unsupported
        case other   => throw new IllegalArgumentException(s"bad xref-stream /Length $other")
      }
      if (len < 0 || lex.p + len > bytes.length)
        throw new IllegalArgumentException("xref stream overruns file")
      val data = applyFilters(dict,
        java.util.Arrays.copyOfRange(bytes, lex.p, lex.p + len), identity)
      val w = dict.getOrElse("W", PNull) match {
        case PArr(xs) => xs.map { case PNum(x) => x.toInt; case o => throw new IllegalArgumentException(s"bad W $o") }
        case other    => throw new IllegalArgumentException(s"bad /W $other")
      }
      if (w.size != 3 || w.exists(x => x < 0 || x > 4)) throw new IllegalArgumentException(s"bad /W $w")
      val size = dict.getOrElse("Size", PNull) match {
        case PNum(x) => x.toInt; case o => throw new IllegalArgumentException(s"bad /Size $o")
      }
      val index = dict.get("Index") match {
        case Some(PArr(xs)) => xs.map { case PNum(x) => x.toInt; case o => throw new IllegalArgumentException(s"bad Index $o") }
        case None           => Vector(0, size)
        case Some(other)    => throw new IllegalArgumentException(s"bad /Index $other")
      }
      if (index.size % 2 != 0) throw new IllegalArgumentException("odd /Index")
      val rowLen = w.sum
      var pos = 0
      def field(width: Int, dflt: Int): Int = {
        if (width == 0) return dflt
        var v = 0; var i = 0
        while (i < width) { v = (v << 8) | (data(pos) & 0xff); pos += 1; i += 1 }
        v
      }
      index.grouped(2).foreach { case Vector(start, count) =>
        if (count < 0 || count > 1000000) throw new IllegalArgumentException("absurd xref section")
        var i = 0
        while (i < count) {
          if (pos + rowLen > data.length) throw new IllegalArgumentException("xref stream truncated")
          val typ = field(w(0), 1) // absent type field defaults to 1
          val f2 = field(w(1), 0)
          val f3 = field(w(2), 0)
          add(start + i, typ, f2, f3)
          i += 1
        }
      }
      dict
    }

    while (next.isDefined) {
      hops += 1
      if (hops > 32) throw new IllegalArgumentException("xref /Prev chain too deep")
      val probe = new Lexer(bytes, next.get)
      probe.ws()
      val isClassic = probe.peek == 'x'
      val tr: Map[String, PVal] =
        if (isClassic) {
          val lex = new Lexer(bytes, next.get)
          lex.expect("xref")
          var inSections = true
          while (inSections) {
            lex.ws()
            val tok = lex.keyword()
            if (tok == "trailer") inSections = false
            else {
              val start = tok.toInt
              val count = lex.keyword().toInt
              if (count < 0 || count > 1000000) throw new IllegalArgumentException("absurd xref section")
              var i = 0
              while (i < count) {
                val off = lex.keyword().toInt
                lex.keyword() // generation
                val typ = lex.keyword()
                if (typ == "n") add(start + i, 1, off, 0)
                i += 1
              }
            }
          }
          val t = new Lexer(bytes, lex.p).value() match {
            case PDict(m) => m
            case other    => throw new IllegalArgumentException(s"bad trailer $other")
          }
          // hybrid file: the classic trailer points at a companion
          // xref STREAM carrying the type-2 entries
          t.get("XRefStm") match {
            case Some(PNum(x)) => readXrefStream(x.toInt)
            case _             => ()
          }
          t
        } else readXrefStream(next.get)
      if (trailer0.isEmpty) trailer0 = Some(tr)
      next = tr.get("Prev") match {
        case Some(PNum(x)) => Some(x.toInt)
        case _             => None
      }
    }
    (Xref(offsets, compressed), trailer0.getOrElse(throw new IllegalArgumentException("no trailer")))
  }

  // ------------------------------------------------------------------
  // Content-stream text extraction
  // ------------------------------------------------------------------

  /** Extract shown text from one page's (concatenated) content stream.
    * See the class scaladoc for the break-collapsing semantics.
    * `fonts` maps a font resource name (the /F1 of a Tf operator) to
    * its /ToUnicode code→text map; string bytes of a mapped font go
    * through it, unmapped fonts read as Latin-1 (≈ WinAnsi on the
    * printable-ASCII range).
    */
  private[multimodal] def extractText(content: Array[Byte],
                                      fonts: Map[String, Map[Int, String]] = Map.empty): String = {
    val lex = new Lexer(content, 0)
    val sb = new StringBuilder
    var pendingBreak = false
    var shown = false
    var curMap: Option[Map[Int, String]] = None
    val stack = ArrayBuffer.empty[PVal]

    def break(): Unit = if (shown) pendingBreak = true
    def mapped(s: String): String = curMap match {
      case None    => s
      case Some(m) => s.flatMap(c => m.getOrElse(c.toInt, c.toString))
    }
    def show(s0: String): Unit = {
      val s = mapped(s0)
      if (pendingBreak) { sb.append('\n'); pendingBreak = false }
      sb.append(s); shown = true
    }
    def popStr(): String = stack.reverseIterator.collectFirst { case PStr(s) => s }.getOrElse("")
    def arg(idxFromEnd: Int): Option[PVal] =
      if (stack.length > idxFromEnd) Some(stack(stack.length - 1 - idxFromEnd)) else None

    while ({ lex.ws(); !lex.eof }) {
      val c = lex.peek
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
          c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        // operand (value); '<' also covers inline dicts (e.g. BDC properties)
        stack += lex.value()
      } else if (c == ']' || c == '>' || c == ')' || c == '{' || c == '}') {
        lex.p += 1 // stray delimiter: skip defensively
      } else {
        lex.keyword() match {
          case "Tj" => show(popStr()); stack.clear()
          case "TJ" =>
            stack.reverseIterator.collectFirst { case PArr(xs) => xs } match {
              case Some(xs) =>
                val s = xs.collect { case PStr(x) => x }.mkString
                show(s)
              case None => ()
            }
            stack.clear()
          case "'" => break(); show(popStr()); stack.clear()
          case "\"" => break(); show(popStr()); stack.clear()
          case "Td" | "TD" =>
            arg(0) match {
              case Some(PNum(ty)) if ty != 0 => break()
              case _                         => ()
            }
            stack.clear()
          case "T*" => break(); stack.clear()
          case "Tf" =>
            // operands: /FontName size — switch the active code map
            stack.reverseIterator.collectFirst { case PName(f) => f }
              .foreach(f => curMap = fonts.get(f))
            stack.clear()
          case ""   => if (!lex.eof) lex.p += 1 // safety: never stall
          case _    => stack.clear() // any other operator consumes its operands
        }
      }
    }
    sb.toString
  }

  /** Parse a /ToUnicode CMap stream: `beginbfchar`/`beginbfrange`
    * sections (src codes 1–2 bytes; dst hex strings are UTF-16BE;
    * bfrange third operand may be a destination array). Simple-font
    * scope: codes fold to a single int, so 1-byte fonts map exactly
    * and the 2-byte CID case degrades safely (codes just miss the
    * map and pass through).
    */
  private[multimodal] def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
    val lex = new Lexer(data, 0)
    val out = scala.collection.mutable.Map.empty[Int, String]
    def codeOf(s: String): Int = s.foldLeft(0)((a, c) => ((a << 8) | (c & 0xff)) & 0xffffff)
    def utf16(s: String): String = {
      val n = s.length / 2 * 2
      (0 until n by 2).map(i => (((s(i) & 0xff) << 8) | (s(i + 1) & 0xff)).toChar).mkString
    }
    def hexOrNull(): Option[String] = {
      lex.ws()
      if (lex.peek == '<') lex.value() match {
        case PStr(s) => Some(s)
        case _       => None
      } else None
    }
    while (!lex.eof) {
      lex.ws()
      if (!lex.eof) {
        val c = lex.peek
        if (isDelim(c) || c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
          try { lex.value(); () } catch { case _: Exception => lex.p += 1 }
        } else lex.keyword() match {
          case "beginbfchar" =>
            var done = false
            while (!done && !lex.eof && out.size < 65536) {
              hexOrNull() match {
                case Some(src) =>
                  hexOrNull().foreach(dst => out(codeOf(src)) = utf16(dst))
                case None => done = true // endbfchar (already consumed by ws+keyword next pass)
              }
              if (!done) { lex.ws(); if (lex.peek != '<') done = true }
            }
          case "beginbfrange" =>
            var done = false
            while (!done && !lex.eof && out.size < 65536) {
              (hexOrNull(), hexOrNull()) match {
                case (Some(lo0), Some(hi0)) =>
                  val lo = codeOf(lo0); val hi = codeOf(hi0)
                  lex.ws()
                  if (lo <= hi && hi - lo < 65536) lex.value() match {
                    case PStr(dst0) =>
                      val dst = utf16(dst0)
                      (lo to hi).foreach { code =>
                        out(code) =
                          if (dst.isEmpty) ""
                          else dst.init + (dst.last + (code - lo)).toChar
                      }
                    case PArr(xs) =>
                      xs.zipWithIndex.foreach {
                        case (PStr(d), i) if lo + i <= hi => out(lo + i) = utf16(d)
                        case _                            => ()
                      }
                    case _ => ()
                  } else lex.value() // consume + ignore an absurd range's dst
                case _ => done = true
              }
              if (!done) { lex.ws(); if (lex.peek != '<') done = true }
            }
          case _ => () // CMap boilerplate (begincmap, CIDSystemInfo, ...)
        }
      }
    }
    out.toMap
  }

  // ------------------------------------------------------------------
  // Top-level decode
  // ------------------------------------------------------------------

  /** Parse a PDF payload into its extracted text layer. */
  def decode(bytes: Array[Byte]): PdfText = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => Invalid }
  }

  /** Shared open path: xref chain → object graph → ordered page
    * list (each with its inherited-or-own /Resources). Throws on any
    * structural problem — callers translate to their invalid shape.
    */
  private def openDoc(bytes: Array[Byte]): (Doc, Seq[(Map[String, PVal], Option[PVal])]) = {
    if (bytes == null || bytes.length < 32)
      throw new IllegalArgumentException("too short")
    if (!(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'))
      throw new IllegalArgumentException("no %PDF magic")

    // locate the LAST 'startxref' keyword near the end of the file
    val tailStart = math.max(0, bytes.length - 2048)
    val tail = new String(bytes, tailStart, bytes.length - tailStart, ISO_8859_1)
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) throw new IllegalArgumentException("no startxref")
    val sxLex = new Lexer(bytes, tailStart + sx)
    sxLex.expect("startxref")
    val xrefOff = sxLex.keyword().toInt
    if (xrefOff < 0 || xrefOff >= bytes.length)
      throw new IllegalArgumentException("startxref out of range")

    val (xref, trailer) = readXref(bytes, xrefOff)
    val doc = new Doc(bytes, xref)

    val rootRef = trailer.getOrElse("Root",
      throw new IllegalArgumentException("trailer without /Root")) match {
      case PRef(n) => n
      case other   => throw new IllegalArgumentException(s"bad /Root $other")
    }
    val catalog = doc.obj(rootRef)._1.asInstanceOf[PDict].v
    val pagesRoot = doc.resolve(catalog.getOrElse("Pages",
      throw new IllegalArgumentException("catalog without /Pages")))

    // page-tree walk: nested /Pages nodes, in /Kids order
    // /Resources inherit down the page tree (T.81-era PDFs hang them
    // on /Pages nodes); a page's own entry wins
    val pages = ArrayBuffer.empty[(Map[String, PVal], Option[PVal])]
    def walk(node: PVal, depth: Int, inhRes: Option[PVal]): Unit = {
      if (depth > 64) throw new IllegalArgumentException("page tree too deep")
      val d = doc.resolve(node).asInstanceOf[PDict].v
      val res = d.get("Resources").orElse(inhRes)
      d.get("Type").map(doc.resolve) match {
        case Some(PName("Pages")) =>
          doc.resolve(d.getOrElse("Kids", PArr(Vector.empty))) match {
            case PArr(kids) => kids.foreach(walk(_, depth + 1, res))
            case other      => throw new IllegalArgumentException(s"bad /Kids $other")
          }
        case Some(PName("Page")) => pages += ((d, res))
        case other               => throw new IllegalArgumentException(s"bad page node $other")
      }
    }
    walk(pagesRoot, 0, None)
    if (pages.isEmpty) throw new IllegalArgumentException("no pages")
    (doc, pages.toSeq)
  }

  private def decodeOrThrow(bytes: Array[Byte]): PdfText = {
    val (doc, pages) = openDoc(bytes)

    /** Font-resource-name → /ToUnicode code map for one page. */
    def fontsOf(res: Option[PVal]): Map[String, Map[Int, String]] =
      res.map(doc.resolve) match {
        case Some(PDict(r)) => doc.resolve(r.getOrElse("Font", PNull)) match {
          case PDict(fm) => fm.flatMap { case (name, fv) =>
            doc.resolve(fv) match {
              case PDict(fd) => fd.get("ToUnicode") match {
                case Some(PRef(n)) =>
                  try Some(name -> parseToUnicode(doc.streamData(n)))
                  catch { case _: Exception => None } // bad CMap: font reads as Latin-1
                case _ => None
              }
              case _ => None
            }
          }
          case _ => Map.empty[String, Map[Int, String]]
        }
        case _ => Map.empty[String, Map[Int, String]]
      }

    val pageTexts = pages.map { case (page, res) =>
      val fonts = fontsOf(res)
      val contents = page.get("Contents").map {
        case PRef(n)  => Vector(n)
        case PArr(xs) => xs.collect { case PRef(n) => n }
        case _        => Vector.empty[Int]
      }.getOrElse(Vector.empty)
      if (contents.isEmpty) ""
      else {
        // array streams concatenate with intervening whitespace
        val joined = new java.io.ByteArrayOutputStream()
        contents.zipWithIndex.foreach { case (n, i) =>
          if (i > 0) joined.write('\n')
          joined.write(doc.streamData(n))
        }
        extractText(joined.toByteArray, fonts)
      }
    }
    val text = pageTexts.mkString("\n")
    PdfText(pages.length, text.length.toLong, text, valid = true)
  }

  // ------------------------------------------------------------------
  // Image XObject extraction
  // ------------------------------------------------------------------

  /** One extracted /Subtype /Image XObject. `imgIdx` counts across
    * the document in (page, resource-name) order; sums are over the
    * DECODED sample bytes (a /DeviceGray image reports its gray sum
    * in all three channels). `valid=false` rows carry zeros — a bad
    * filter chain or a geometry mismatch never throws and never
    * hides the image's existence.
    */
  final case class PdfImage(imgIdx: Int, width: Int, height: Int, nBytes: Int,
                            sumR: Long, sumG: Long, sumB: Long, valid: Boolean)

  private def InvalidImage(idx: Int) = PdfImage(idx, 0, 0, 0, 0L, 0L, 0L, valid = false)

  /** Extract every image XObject reachable from the page tree, in
    * (page, sorted resource name) order — the image twin of
    * [[decode]]: the filter CHAIN (Flate/LZW/DCT) runs through the
    * same [[applyFilters]] path the text layer uses, and the decoded
    * sample buffer is validated against Width×Height×components of
    * the declared /ColorSpace. A structurally unreadable document
    * yields an empty list; a single bad image yields its own
    * `valid=false` row without hiding its siblings.
    */
  def decodeImages(bytes: Array[Byte]): Seq[PdfImage] = {
    val (doc, pages) =
      try openDoc(bytes)
      catch { case _: Exception => return Seq.empty }
    val out = ArrayBuffer.empty[PdfImage]
    val seen = scala.collection.mutable.Set.empty[Int] // an XObject shared across pages counts once
    pages.foreach { case (_, res) =>
      val xobjs: Seq[(String, Int)] = (try doc.resolve(res.getOrElse(PNull)) catch {
        case _: Exception => PNull
      }) match {
        case PDict(r) => (try doc.resolve(r.getOrElse("XObject", PNull)) catch {
          case _: Exception => PNull
        }) match {
          case PDict(xm) => xm.toSeq.collect { case (name, PRef(n)) => (name, n) }.sortBy(_._1)
          case _         => Seq.empty
        }
        case _ => Seq.empty
      }
      xobjs.foreach { case (_, n) =>
        if (!seen.contains(n)) {
          seen += n
          val idx = out.length
          out += (try {
            val d = doc.obj(n)._1 match {
              case PDict(m) => m
              case _        => throw new IllegalArgumentException("XObject is not a dict")
            }
            if (doc.resolve(d.getOrElse("Subtype", PNull)) != PName("Image"))
              throw new IllegalArgumentException("not an image XObject")
            val w = doc.resolve(d.getOrElse("Width", PNull)) match {
              case PNum(x) if x > 0 && x <= (1 << 16) => x.toInt
              case o => throw new IllegalArgumentException(s"bad /Width $o")
            }
            val h = doc.resolve(d.getOrElse("Height", PNull)) match {
              case PNum(x) if x > 0 && x <= (1 << 16) => x.toInt
              case o => throw new IllegalArgumentException(s"bad /Height $o")
            }
            val comps = doc.resolve(d.getOrElse("ColorSpace", PNull)) match {
              case PName("DeviceRGB")  => 3
              case PName("DeviceGray") => 1
              case o => throw new IllegalArgumentException(s"unsupported colorspace $o")
            }
            doc.resolve(d.getOrElse("BitsPerComponent", PNum(8))) match {
              case PNum(x) if x == 8 => ()
              case o => throw new IllegalArgumentException(s"unsupported bpc $o")
            }
            val samples = doc.streamData(n)
            if (samples.length.toLong != w.toLong * h * comps)
              throw new IllegalArgumentException(
                s"sample buffer ${samples.length} != ${w}x${h}x$comps")
            var sr = 0L; var sg = 0L; var sb = 0L
            if (comps == 3) {
              var j = 0
              while (j < samples.length) {
                sr += samples(j) & 0xff
                sg += samples(j + 1) & 0xff
                sb += samples(j + 2) & 0xff
                j += 3
              }
            } else {
              var j = 0
              while (j < samples.length) { sr += samples(j) & 0xff; j += 1 }
              sg = sr; sb = sr
            }
            PdfImage(idx, w, h, samples.length, sr, sg, sb, valid = true)
          } catch { case _: Exception => InvalidImage(idx) })
        }
      }
    }
    out.toSeq
  }
}
