package graft.multimodal

/** Minimal baseline-TIFF codec — REAL pixel decode for the LAST
  * format on the reference's supported-input list that was still
  * fake-routed: `UniversalExtractor.extractor_map` accepts `.tiff` /
  * `.tif` (restaurant_etl/extractors/universal_extractor.py:16,
  * image_extractor.py:14) and every other entry on that list
  * (pdf/jpg/jpeg/png/bmp) already has a hand-rolled decoder here.
  *
  * Scope (TIFF 6.0 baseline + the two ubiquitous compressions):
  *  - BOTH byte orders (`II` little- and `MM` big-endian) — TIFF is
  *    the one common raster format where endianness is per-file;
  *  - classic IFD walk: SHORT/LONG/BYTE tag values, inline or
  *    offset-addressed, first IFD only (multi-page stays out, like
  *    multi-frame GIF);
  *  - strip organization (RowsPerStrip / StripOffsets /
  *    StripByteCounts, any strip count);
  *  - Compression 1 (none), 32773 (PackBits), and 5 (LZW — the
  *    TIFF variant: MSB-first bit packing, 9→12-bit codes with
  *    EARLY code-width change, Clear/EOI, the KwKwK case), plus
  *    horizontal-differencing Predictor 2 for LZW;
  *  - PhotometricInterpretation 0/1 (grayscale, both polarities,
  *    SamplesPerPixel 1) and 2 (RGB, SamplesPerPixel 3), 8-bit
  *    samples, chunky planar config.
  * Anything else — tiled layout, 16-bit, palette, CCITT/JPEG-in-TIFF,
  * planar=2 — yields `valid=false`, never an exception (the
  * crawl-scale contract shared by every decoder in this package).
  *
  * The companion `encode` writes the same subset (both orders × all
  * three compressions × predictor × gray/RGB) for the
  * encode-with-own-writer oracle pattern; TiffSpec additionally
  * cross-checks `decode` against the JDK's own ImageIO TIFF plugin
  * in both directions on table-filling noise images.
  */
object Tiff {

  final case class TiffInfo(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val Invalid = TiffInfo(0, 0, 0L, 0L, 0L, 0, valid = false)

  private val MaxDim = 1 << 15 // 32k px per side — fixture/crawl sanity bound

  /** Byte-order-aware reader over the whole file. */
  private final class Rd(val b: Array[Byte], val be: Boolean) {
    def u8(o: Long): Int = b(o.toInt) & 0xff
    def u16(o: Long): Int =
      if (be) (u8(o) << 8) | u8(o + 1) else (u8(o + 1) << 8) | u8(o)
    def u32(o: Long): Long =
      if (be) (u16(o).toLong << 16) | u16(o + 2)
      else (u16(o + 2).toLong << 16) | u16(o)
  }

  /** One parsed IFD entry's values, widened to Long. */
  private def entryValues(r: Rd, entryOff: Long): (Int, Array[Long]) = {
    val tag = r.u16(entryOff)
    val typ = r.u16(entryOff + 2)
    val cnt = r.u32(entryOff + 4)
    val elemSize = typ match {
      case 1 => 1 // BYTE
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case _ => return (tag, null) // unsupported value type: caller decides
    }
    if (cnt < 0 || cnt > (1 << 20)) return (tag, null)
    val total = elemSize * cnt
    val base = if (total <= 4) entryOff + 8 else r.u32(entryOff + 8)
    val out = new Array[Long](cnt.toInt)
    var i = 0
    while (i < cnt) {
      out(i) = typ match {
        case 1 => r.u8(base + i).toLong
        case 3 => r.u16(base + i * 2L).toLong
        case 4 => r.u32(base + i * 4L)
      }
      i += 1
    }
    (tag, out)
  }

  // ---- decompressors ---------------------------------------------------

  /** PackBits (Apple RLE): n>=0 → n+1 literals; -127..-1 → repeat
    * next byte 1-n times; -128 noop. Decodes until `outLen` produced.
    */
  private def packbitsDecode(src: Array[Byte], from: Int, len: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = from
    val end = from + len
    var o = 0
    while (o < outLen) {
      if (i >= end) throw new IllegalArgumentException("packbits underrun")
      val n = src(i); i += 1
      if (n >= 0) {
        val k = n + 1
        if (i + k > end || o + k > outLen) throw new IllegalArgumentException("packbits literal overrun")
        System.arraycopy(src, i, out, o, k)
        i += k; o += k
      } else if (n != -128) {
        val k = 1 - n
        if (i >= end || o + k > outLen) throw new IllegalArgumentException("packbits run overrun")
        val v = src(i); i += 1
        var j = 0
        while (j < k) { out(o) = v; o += 1; j += 1 }
      }
    }
    out
  }

  private val ClearCode = 256
  private val EoiCode = 257

  /** TIFF LZW: MSB-first bit packing, initial 9-bit codes, table
    * reset on Clear, EARLY code-width change (width bumps when the
    * next free slot reaches 2^w − 1, one code before GIF would).
    */
  private def lzwDecode(src: Array[Byte], from: Int, len: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var o = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = from.toLong * 8
    val bitEnd = (from + len).toLong * 8
    def read(): Int = {
      if (bitPos + width > bitEnd) throw new IllegalArgumentException("lzw bit underrun")
      var v = 0
      var i = 0
      while (i < width) {
        val byte = src((bitPos >> 3).toInt) & 0xff
        v = (v << 1) | ((byte >> (7 - (bitPos & 7)).toInt) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    // expand a code's string into out (codes <256 are literals)
    val stack = new Array[Byte](4096)
    def emit(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= 258) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        if (sp >= stack.length) throw new IllegalArgumentException("lzw cycle")
      }
      val first = c.toByte
      if (o + sp + 1 > outLen) throw new IllegalArgumentException("lzw output overrun")
      out(o) = first; o += 1
      while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
      first
    }
    var oldCode = -1
    var done = false
    while (!done && o < outLen) {
      val code = read()
      if (code == EoiCode) done = true
      else if (code == ClearCode) { next = 258; width = 9; oldCode = -1 }
      else if (oldCode == -1) {
        if (code >= 256) throw new IllegalArgumentException("lzw first code not literal")
        emit(code)
        oldCode = code
      } else {
        if (code > next) throw new IllegalArgumentException("lzw code beyond table")
        val first =
          if (code == next) { // KwKwK: string = old + firstByte(old)
            var c = oldCode
            while (c >= 258) c = prefix(c)
            prefix(next) = oldCode; suffix(next) = c.toByte
            next += 1
            if (next == (1 << width) - 1 && width < 12) width += 1
            emit(code)
          } else {
            val f = emit(code)
            prefix(next) = oldCode; suffix(next) = f
            next += 1
            if (next == (1 << width) - 1 && width < 12) width += 1
            f
          }
        oldCode = code
        locally(first) // value folded into the table writes above
      }
    }
    if (o != outLen) throw new IllegalArgumentException(s"lzw short output $o/$outLen")
    out
  }

  // ---- decode ----------------------------------------------------------

  /** Decode to row-major top-down RGB triplets (gray expanded). */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeOrThrow(bytes)
    catch { case _: Exception => None }

  private def decodeOrThrow(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) return None
    val be =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return None
    val r = new Rd(bytes, be)
    if (r.u16(2) != 42) return None
    val ifd = r.u32(4)
    val n = r.u16(ifd)
    val tags = scala.collection.mutable.Map.empty[Int, Array[Long]]
    var i = 0
    while (i < n) {
      val (tag, vs) = entryValues(r, ifd + 2 + i * 12L)
      if (vs != null) tags(tag) = vs
      i += 1
    }
    def one(tag: Int, default: Long = -1L): Long =
      tags.get(tag).filter(_.nonEmpty).map(_.head).getOrElse(default)

    val w = one(256).toInt
    val h = one(257).toInt
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    val spp = one(277, 1L).toInt
    if (spp != 1 && spp != 3) return None
    val bits = tags.getOrElse(258, Array(8L))
    if (!bits.forall(_ == 8L)) return None
    val comp = one(259, 1L).toInt
    if (comp != 1 && comp != 5 && comp != 32773) return None
    val photo = one(262, if (spp == 3) 2L else 1L).toInt
    if ((spp == 3 && photo != 2) || (spp == 1 && photo != 0 && photo != 1)) return None
    if (one(284, 1L) != 1L) return None // chunky only
    val predictor = one(317, 1L).toInt
    if (predictor != 1 && (predictor != 2 || comp != 5)) return None
    val rps0 = one(278, h.toLong)
    val rps = if (rps0 <= 0 || rps0 > h) h else rps0.toInt
    val offs = tags.getOrElse(273, return None)
    val cnts = tags.getOrElse(279, return None)
    val nStrips = (h + rps - 1) / rps
    if (offs.length < nStrips || cnts.length < nStrips) return None

    val rowBytes = w * spp
    val raw = new Array[Byte](h * rowBytes)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rps, h - strip * rps)
      val expect = rows * rowBytes
      val off = offs(strip)
      val len = cnts(strip)
      if (off < 0 || len < 0 || off + len > bytes.length) throw new IllegalArgumentException("strip out of range")
      val data = comp match {
        case 1 =>
          if (len < expect) throw new IllegalArgumentException("short uncompressed strip")
          java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + expect)
        case 32773 => packbitsDecode(bytes, off.toInt, len.toInt, expect)
        case 5     => lzwDecode(bytes, off.toInt, len.toInt, expect)
      }
      if (predictor == 2) {
        var row = 0
        while (row < rows) {
          var j = spp
          while (j < rowBytes) {
            data(row * rowBytes + j) = (data(row * rowBytes + j) + data(row * rowBytes + j - spp)).toByte
            j += 1
          }
          row += 1
        }
      }
      System.arraycopy(data, 0, raw, strip * rps * rowBytes, expect)
      strip += 1
    }

    val rgb = new Array[Byte](w * h * 3)
    if (spp == 3) System.arraycopy(raw, 0, rgb, 0, rgb.length)
    else {
      var p = 0
      while (p < w * h) {
        val v0 = raw(p) & 0xff
        val v = (if (photo == 0) 255 - v0 else v0).toByte
        rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
        p += 1
      }
    }
    Some((w, h, rgb))
  }

  /** Exact integer pixel statistics — the `Bmp.decode`-shaped entry
    * the stats router uses; malformed/unsupported → invalid row.
    */
  def decode(bytes: Array[Byte]): TiffInfo =
    decodePixels(bytes) match {
      case Some((w, h, rgb)) =>
        var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
        var p = 0
        while (p < w * h) {
          val r0 = rgb(p * 3) & 0xff; val g0 = rgb(p * 3 + 1) & 0xff; val b0 = rgb(p * 3 + 2) & 0xff
          sr += r0; sg += g0; sb += b0
          if (r0 > peak) peak = r0
          if (g0 > peak) peak = g0
          if (b0 > peak) peak = b0
          p += 1
        }
        TiffInfo(w, h, sr, sg, sb, peak, valid = true)
      case None => Invalid
    }

  // ---- encode (fixture writer) ----------------------------------------

  /** Greedy-dictionary TIFF LZW encoder (MSB-first, early change,
    * conservative Clear at 4000 entries — spec-legal anywhere).
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var cur = 0
    var nbits = 0
    var width = 9
    var next = 258
    val dict = new java.util.HashMap[Integer, Integer](8192)
    def put(code: Int): Unit = {
      cur = (cur << width) | code
      nbits += width
      while (nbits >= 8) { out.write((cur >> (nbits - 8)) & 0xff); nbits -= 8 }
    }
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(ClearCode)
    if (data.nonEmpty) {
      var run = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key = (run << 8) | b
        val hit = dict.get(key)
        if (hit != null) run = hit
        else {
          put(run)
          dict.put(key, next)
          next += 1
          // the encoder's table runs ONE entry ahead of the decoder's
          // (the decoder can't build from its first code), so the
          // encoder bumps at 2^w where the decoder bumps at 2^w − 1 —
          // the classic TIFF early-change pairing
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4000) { put(ClearCode); reset() }
          run = b
        }
        i += 1
      }
      put(run)
    }
    put(EoiCode)
    if (nbits > 0) out.write((cur << (8 - nbits)) & 0xff)
    out.toByteArray
  }

  /** Per-row PackBits encoder (TIFF 6.0: each row restarts). */
  private def packbitsEncode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 64 + 16)
    var r0 = 0
    while (r0 < data.length) {
      val end = math.min(r0 + rowBytes, data.length)
      var i = r0
      while (i < end) {
        // find run length at i
        var j = i + 1
        while (j < end && data(j) == data(i) && j - i < 127) j += 1
        if (j - i >= 3) {
          out.write(1 - (j - i)) // -(n-1)
          out.write(data(i))
          i = j
        } else {
          // literal run until next >=3 repeat or 128 cap
          var k = i
          var lit = 0
          var brk = false
          while (k < end && lit < 128 && !brk) {
            if (k + 2 < end && data(k) == data(k + 1) && data(k) == data(k + 2)) brk = true
            else { k += 1; lit += 1 }
          }
          out.write(lit - 1)
          out.write(data, i, lit)
          i = k
        }
      }
      r0 = end
    }
    out.toByteArray
  }

  /** Write a baseline TIFF of row-major top-down pixels.
    *
    * @param rgb         w*h*3 RGB bytes (used when gray=false) or
    *                    w*h gray bytes (gray=true)
    * @param bigEndian   `MM` vs `II` container order
    * @param compression 1 none, 5 LZW, 32773 PackBits
    * @param rowsPerStrip strip height (multi-strip when < h)
    * @param predictor   1 or 2 (horizontal differencing; LZW only)
    * @param gray        SamplesPerPixel 1
    * @param whiteIsZero store gray inverted with Photometric 0
    */
  def encode(width: Int, height: Int, rgb: Array[Byte], bigEndian: Boolean = false,
             compression: Int = 1, rowsPerStrip: Int = Int.MaxValue,
             predictor: Int = 1, gray: Boolean = false,
             whiteIsZero: Boolean = false): Array[Byte] = {
    val spp = if (gray) 1 else 3
    require(rgb.length == width * height * spp, s"need w*h*$spp bytes")
    require(compression == 1 || compression == 5 || compression == 32773, "compression")
    require(predictor == 1 || (predictor == 2 && compression == 5), "predictor 2 needs LZW")
    require(!whiteIsZero || gray, "whiteIsZero is a grayscale mode")
    val rowBytes = width * spp
    val rps = math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps

    val src =
      if (!whiteIsZero) rgb
      else rgb.map(b => (255 - (b & 0xff)).toByte)

    val strips: IndexedSeq[Array[Byte]] = (0 until nStrips).map { s =>
      val rows = math.min(rps, height - s * rps)
      val body = java.util.Arrays.copyOfRange(src, s * rps * rowBytes, (s * rps + rows) * rowBytes)
      if (predictor == 2) {
        var row = 0
        while (row < rows) {
          var j = rowBytes - 1
          while (j >= spp) {
            body(row * rowBytes + j) = (body(row * rowBytes + j) - body(row * rowBytes + j - spp)).toByte
            j -= 1
          }
          row += 1
        }
      }
      compression match {
        case 1     => body
        case 5     => lzwEncode(body)
        case 32773 => packbitsEncode(body, rowBytes)
      }
    }

    val out = new java.io.ByteArrayOutputStream(src.length + 512)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      else { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }

    // header
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    // pixel data starts at 8; IFD follows it (word-aligned)
    val stripOffs = new Array[Long](nStrips)
    var pos = 8L
    for (s <- 0 until nStrips) { stripOffs(s) = pos; pos += strips(s).length }
    if (pos % 2 != 0) pos += 1
    val ifdOff = pos
    w32(ifdOff)
    strips.foreach(st => out.write(st))
    if ((8L + strips.map(_.length.toLong).sum) % 2 != 0) out.write(0)

    // IFD entries (ascending tag order)
    case class E(tag: Int, typ: Int, cnt: Int, inline: Option[Long], ext: Option[Array[Long]])
    val entries = scala.collection.mutable.ArrayBuffer.empty[E]
    entries += E(256, 4, 1, Some(width.toLong), None)
    entries += E(257, 4, 1, Some(height.toLong), None)
    if (spp == 1) entries += E(258, 3, 1, Some(8L), None)
    else entries += E(258, 3, 3, None, Some(Array(8L, 8L, 8L)))
    entries += E(259, 3, 1, Some(compression.toLong), None)
    entries += E(262, 3, 1, Some(if (gray) { if (whiteIsZero) 0L else 1L } else 2L), None)
    if (nStrips == 1) entries += E(273, 4, 1, Some(stripOffs(0)), None)
    else entries += E(273, 4, nStrips, None, Some(stripOffs))
    entries += E(277, 3, 1, Some(spp.toLong), None)
    entries += E(278, 4, 1, Some(rps.toLong), None)
    if (nStrips == 1) entries += E(279, 4, 1, Some(strips(0).length.toLong), None)
    else entries += E(279, 4, nStrips, None, Some(strips.map(_.length.toLong).toArray))
    entries += E(284, 3, 1, Some(1L), None)
    if (predictor == 2) entries += E(317, 3, 1, Some(2L), None)

    val ifdBytes = 2 + entries.length * 12 + 4
    var extOff = ifdOff + ifdBytes
    val extPos = entries.map { e =>
      e.ext match {
        case Some(vs) =>
          val here = extOff
          extOff += vs.length.toLong * (if (e.typ == 3) 2 else 4)
          if (extOff % 2 != 0) extOff += 1
          Some(here)
        case None => None
      }
    }

    w16(entries.length)
    for ((e, ep) <- entries.zip(extPos)) {
      w16(e.tag); w16(e.typ); w32(e.cnt.toLong)
      (e.inline, ep) match {
        case (Some(v), _) =>
          // inline values sit in the first bytes of the 4-byte field
          if (e.typ == 3) { w16(v.toInt); w16(0) } else w32(v)
        case (None, Some(off)) => w32(off)
        case _                 => throw new IllegalStateException("entry without value")
      }
    }
    w32(0L) // no next IFD
    for ((e, ep) <- entries.zip(extPos); if ep.isDefined; vs = e.ext.get) {
      var written = 0L
      vs.foreach { v => if (e.typ == 3) { w16(v.toInt); written += 2 } else { w32(v); written += 4 } }
      if (written % 2 != 0) out.write(0)
    }
    out.toByteArray
  }
}
