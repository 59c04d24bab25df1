package graft.multimodal

/** Minimal baseline JPEG decoder — moves the LAST image codec out of
  * the header-only tier ([[Bmp]], [[Png]], [[Gif]], [[Wav]] are
  * already real), with zero native dependencies: the JFIF container
  * (marker walk), canonical Huffman entropy coding, dequantization,
  * the 8×8 inverse DCT, and YCbCr→RGB conversion are fully specified
  * public formats (ITU-T T.81). After this the genuinely-native
  * stubs are audio codecs (MP3/AAC) and OCR only — the reference's
  * `image_extractor.py:1` delegates JPEG decode to PIL before its
  * PaddleOCR call; here decode itself is the deliverable.
  *
  * Scope: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  * spectral selection + successive approximation, DC/AC first and
  * refinement scans with EOB runs, per T.81 G.2; the most common
  * crawl variant after baseline), 8-bit samples, 1 or 3 components,
  * sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals.
  * Arithmetic coding and hierarchical (SOF3+) are rejected
  * (`valid=false`) — the crawl-scale contract is a row, never an
  * exception.
  *
  * Determinism: the IDCT is double-precision over a StrictMath cos
  * basis (IEEE arithmetic — bit-identical on every JVM) and the
  * color convert is 16-bit fixed-point INTEGER math (the classical
  * 91881/22554/46802/116130 constants), so for DC-only blocks the
  * decoded pixels are EXACT integer arithmetic the q90 oracle
  * mirrors in SQL; for general blocks JpegSpec cross-checks this
  * decoder against the JDK's own JPEG reader on the same bytes.
  */
object Jpeg {

  /** `valid=false` rows carry zeros (malformed payloads yield a row,
    * never an exception).
    */
  final case class JpegInfo(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val Invalid = JpegInfo(0, 0, 0L, 0L, 0L, 0, valid = false)

  /** Parse a JPEG payload into exact integer pixel statistics. */
  def decode(bytes: Array[Byte]): JpegInfo = {
    val px = decodePixels(bytes)
    if (px == null) Invalid
    else {
      var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
      var i = 0
      while (i < px.rgb.length) {
        val p = px.rgb(i)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sumR += r; sumG += g; sumB += b
        val m = math.max(r, math.max(g, b))
        if (m > peak) peak = m
        i += 1
      }
      JpegInfo(px.width, px.height, sumR, sumG, sumB, peak, valid = true)
    }
  }

  /** Decoded frame for spec-level pixel cross-checks (0xRRGGBB). */
  private[multimodal] final case class Pixels(width: Int, height: Int, rgb: Array[Int])

  private[multimodal] def decodePixels(bytes: Array[Byte]): Pixels = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => null }
  }

  // ---- tables ----------------------------------------------------------

  /** Zig-zag order: zigzag(k) = natural position of the k-th coefficient. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: basis(u)(x) = C(u)·cos((2x+1)uπ/16), StrictMath so the
    * table — and therefore every decode — is JVM-independent.
    */
  private val basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** Canonical Huffman table in the T.81 F.2.2.3 decode shape. */
  private final class Huff(counts: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length, "huffman counts/vals mismatch")
    }
  }

  // ---- bit reader ------------------------------------------------------

  /** MSB-first entropy-segment reader: un-stuffs 0xFF00, stops at any
    * real marker (leaving it for the caller), byte-aligns across
    * restart markers.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0

    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= data.length) throw new IllegalStateException("truncated scan")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new IllegalStateException("truncated scan")
          val m = data(pos) & 0xff
          if (m == 0x00) { pos += 1 } // stuffed byte
          else throw new IllegalStateException("marker in scan") // EOI/DNL mid-block
          b = 0xff
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.vals(h.valPtr(l) + code - h.minCode(l)) & 0xff
        code = (code << 1) | readBit()
        l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      bitCnt = 0
      if (pos + 1 >= data.length) throw new IllegalStateException("truncated at restart")
      if ((data(pos) & 0xff) != 0xff || (data(pos + 1) & 0xff) != (0xd0 + n))
        throw new IllegalStateException("missing restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---- frame decode ----------------------------------------------------

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = _
    var acTab: Huff = _
    var pred: Int = 0
    var plane: Array[Int] = _ // sampled-resolution samples, 0..255
    var planeW: Int = 0
    var planeH: Int = 0
    // progressive: un-dequantized coefficients for every block of the
    // MCU-padded grid, natural order within each 64-int block
    var coefs: Array[Int] = _
    var bwFull: Int = 0 // padded block-grid width (mcusX * h)
    var bhFull: Int = 0
    var bw: Int = 0 // non-interleaved block-grid dims: ceil(sampled/8)
    var bh: Int = 0
  }

  private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def decodeOrThrow(bytes: Array[Byte]): Pixels = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null // SOI

    val quant = new Array[Array[Int]](4) // zig-zag order, as stored
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    var sawScan = false

    var p = 2
    // p+1 (not p+3): the trailing EOI is exactly the last two bytes of
    // a progressive stream; payload reads past the end throw and land
    // in decodePixels' catch
    while (p + 1 < bytes.length) {
      if ((bytes(p) & 0xff) != 0xff) return null
      var marker = bytes(p + 1) & 0xff
      p += 2
      while (marker == 0xff && p < bytes.length) { marker = bytes(p) & 0xff; p += 1 } // fill bytes
      marker match {
        case 0xd8 => // stray SOI
        case 0xd9 => // EOI: progressive frames finish here
          return if (progressive && sawScan)
            finishProgressive(comps, width, height, quant)
          else null
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 (baseline layout) or SOF2 (progressive)
          val len = u16(bytes, p)
          if (bytes(p + 2) != 8) return null // 8-bit samples only
          progressive = marker == 0xc2
          height = u16(bytes, p + 3); width = u16(bytes, p + 5)
          val n = bytes(p + 7) & 0xff
          if (width <= 0 || height <= 0 || (n != 1 && n != 3)) return null
          if (width.toLong * height > 64L * 1024 * 1024) return null
          comps = Array.tabulate(n) { i =>
            val o = p + 8 + i * 3
            val hv = bytes(o + 1) & 0xff
            val c = Comp(bytes(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf, bytes(o + 2) & 0xff)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return null
            c
          }
          p += len
        case 0xc4 => // DHT (possibly several tables in one segment)
          val len = u16(bytes, p)
          var o = p + 2
          while (o < p + len) {
            val tcth = bytes(o) & 0xff
            val counts = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val total = counts.sum
            if (total > 256) return null
            val vals = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + total)
            val h = new Huff(counts, vals)
            if ((tcth >> 4) == 0) dcTabs(tcth & 0xf) = h else acTabs(tcth & 0xf) = h
            o += 17 + total
          }
          p += len
        case 0xdb => // DQT (possibly several tables)
          val len = u16(bytes, p)
          var o = p + 2
          while (o < p + len) {
            val pqtq = bytes(o) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0xf
            if (tq > 3) return null
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) bytes(o + 1 + i) & 0xff else u16(bytes, o + 1 + i * 2)
              i += 1
            }
            quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
          p += len
        case 0xdd => // DRI
          restartInterval = u16(bytes, p + 2)
          p += u16(bytes, p)
        case 0xda => // SOS
          if (comps == null) return null
          val len = u16(bytes, p)
          val ns = bytes(p + 2) & 0xff
          if (progressive) {
            if (ns < 1 || ns > comps.length) return null
            val scanComps = new Array[Comp](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(p + 3 + i * 2) & 0xff
              val tt = bytes(p + 4 + i * 2) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return null)
              c.dcTab = dcTabs((tt >> 4) & 0xf); c.acTab = acTabs(tt & 0xf)
              scanComps(i) = c
              i += 1
            }
            val ss = bytes(p + 3 + ns * 2) & 0xff
            val se = bytes(p + 4 + ns * 2) & 0xff
            val ahal = bytes(p + 5 + ns * 2) & 0xff
            val ah = (ahal >> 4) & 0xf; val al = ahal & 0xf
            if (!sawScan) allocateCoefs(comps, width, height)
            sawScan = true
            p = decodeProgScan(bytes, p + len, comps, scanComps,
              ss, se, ah, al, restartInterval)
            if (p < 0) return null
          } else {
            if (ns != comps.length) return null // baseline non-interleaved: out of scope
            var i = 0
            while (i < ns) {
              val cid = bytes(p + 3 + i * 2) & 0xff
              val tt = bytes(p + 4 + i * 2) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return null)
              c.dcTab = dcTabs((tt >> 4) & 0xf); c.acTab = acTabs(tt & 0xf)
              if (c.dcTab == null || c.acTab == null || quant(c.tq) == null) return null
              i += 1
            }
            return decodeScan(bytes, p + len, comps, width, height, quant, restartInterval)
          }
        case m if m >= 0xd0 && m <= 0xd7 => // RST outside a scan: malformed
          return null
        case 0x01 => // TEM, no payload
        case _ => // APPn / COM / everything else: length-prefixed skip
          p += u16(bytes, p)
      }
    }
    null
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, comps: Array[Comp],
                         width: Int, height: Int, quant: Array[Array[Int]],
                         restartInterval: Int): Pixels = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }

    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var rstCount = 0
    var rstMark = 0

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          br.restart(rstMark)
          rstMark = (rstMark + 1) & 7
          rstCount = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = br.decodeHuff(c.dcTab)
              if (t > 11) throw new IllegalStateException("bad DC category")
              c.pred += extend(br.receive(t), t)
              coef(0) = c.pred * q(0)
              // AC
              var k = 1
              var done = false
              while (!done && k < 64) {
                val rs = br.decodeHuff(c.acTab)
                val r = rs >> 4; val s = rs & 0xf
                if (s == 0) {
                  if (r == 15) k += 16 else done = true // ZRL vs EOB
                } else {
                  k += r
                  if (k > 63) throw new IllegalStateException("AC overrun")
                  coef(zigzag(k)) = extend(br.receive(s), s) * q(k)
                  k += 1
                }
              }
              idct(coef, block)
              // place block into the component plane
              val ox = (mx * c.h + bx) * 8
              val oy = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val rowOff = (oy + yy) * c.planeW + ox
                while (xx < 8) {
                  c.plane(rowOff + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }

    composePixels(comps, width, height, maxH, maxV)
  }

  /** Planes → RGB: upsample each plane to full resolution (triangle
    * filter — the "fancy upsampling" class libjpeg-family decoders
    * default to, so the JpegSpec cross-check against the JDK reader
    * stays within rounding), then color convert in 16-bit fixed
    * point. Shared by the baseline and progressive finish paths.
    */
  private def composePixels(comps: Array[Comp], width: Int, height: Int,
                            maxH: Int, maxV: Int): Pixels = {
    val full = comps.map(c => upsample(c, width, height, maxH, maxV))
    val rgb = new Array[Int](width * height)
    val gray = comps.length == 1
    val py = full(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * width + x
        val yv = py(i)
        val p =
          if (gray) (yv << 16) | (yv << 8) | yv
          else {
            val cbv = full(1)(i) - 128
            val crv = full(2)(i) - 128
            val r = clamp(yv + ((91881 * crv + 32768) >> 16))
            val g = clamp(yv + ((-22554 * cbv - 46802 * crv + 32768) >> 16))
            val b = clamp(yv + ((116130 * cbv + 32768) >> 16))
            (r << 16) | (g << 8) | b
          }
        rgb(i) = p
        x += 1
      }
      y += 1
    }
    Pixels(width, height, rgb)
  }

  // ---- progressive (SOF2) ----------------------------------------------

  private def allocateCoefs(comps: Array[Comp], width: Int, height: Int): Unit = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.bwFull = mcusX * c.h
      c.bhFull = mcusY * c.v
      val sw = (width * c.h + maxH - 1) / maxH
      val sh = (height * c.v + maxV - 1) / maxV
      c.bw = (sw + 7) / 8
      c.bh = (sh + 7) / 8
      c.coefs = new Array[Int](c.bwFull * c.bhFull * 64)
      c.pred = 0
    }
  }

  /** Decode one progressive scan (T.81 G.2) into the coefficient
    * buffers; returns the byte offset of the next marker, or -1 on a
    * malformed scan header. DC scans (Ss=0) may interleave all
    * components; AC scans (Ss>0) are single-component by the
    * standard. EOB runs span blocks WITHIN a scan; restarts reset
    * predictions and the run.
    */
  private def decodeProgScan(bytes: Array[Byte], start: Int, comps: Array[Comp],
                             scanComps: Array[Comp], ss: Int, se: Int,
                             ah: Int, al: Int, restartInterval: Int): Int = {
    if (ss < 0 || se > 63 || ss > se || al > 13) return -1
    val dc = ss == 0
    if (dc && se != 0) return -1
    if (!dc && scanComps.length != 1) return -1
    if (dc && ah == 0 && scanComps.exists(_.dcTab == null)) return -1
    if (!dc && ah == 0 && scanComps(0).acTab == null) return -1
    // AC refinement needs the table too (for EOB-run / run symbols)
    if (!dc && ah > 0 && scanComps(0).acTab == null) return -1

    val br = new BitReader(bytes, start)
    scanComps.foreach(_.pred = 0)
    var eobrun = 0
    var rstCount = 0
    var rstMark = 0
    val p1 = 1 << al
    val m1 = -1 << al

    def maybeRestart(): Unit = {
      if (restartInterval > 0 && rstCount == restartInterval) {
        br.restart(rstMark)
        rstMark = (rstMark + 1) & 7
        rstCount = 0
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }
      rstCount += 1
    }

    def decodeDcBlock(c: Comp, off: Int): Unit = {
      if (ah == 0) {
        val t = br.decodeHuff(c.dcTab)
        if (t > 11) throw new IllegalStateException("bad DC category")
        c.pred += extend(br.receive(t), t)
        c.coefs(off) = c.pred << al
      } else if (br.readBit() == 1) {
        c.coefs(off) |= p1
      }
    }

    /** AC first scan for one block (libjpeg decode_mcu_AC_first). */
    def decodeAcFirst(c: Comp, off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      var done = false
      while (!done && k <= se) {
        val rs = br.decodeHuff(c.acTab)
        val r = rs >> 4; val s = rs & 0xf
        if (s != 0) {
          k += r
          if (k > se) throw new IllegalStateException("AC overrun")
          c.coefs(off + zigzag(k)) = extend(br.receive(s), s) << al
          k += 1
        } else if (r == 15) {
          k += 16 // ZRL
        } else {
          eobrun = (1 << r) - 1
          if (r > 0) eobrun += br.receive(r)
          done = true
        }
      }
    }

    /** AC refinement for one block (libjpeg decode_mcu_AC_refine). */
    def decodeAcRefine(c: Comp, off: Int): Unit = {
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (!break && k <= se) {
          val rs = br.decodeHuff(c.acTab)
          var r = rs >> 4; val s0 = rs & 0xf
          var ins = 0
          if (s0 == 0) {
            if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              break = true // remaining coefficients handled in the EOB tail
            }
            // r == 15: skip 16 zero-history coefficients
          } else {
            if (s0 != 1) throw new IllegalStateException("bad AC refine size")
            ins = if (br.readBit() == 1) p1 else m1
          }
          if (!break) {
            var placed = false
            while (!placed && k <= se) {
              val z = off + zigzag(k)
              if (c.coefs(z) != 0) {
                if (br.readBit() == 1 && (c.coefs(z) & p1) == 0)
                  c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (ins != 0) c.coefs(z) = ins
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && ins != 0) throw new IllegalStateException("AC refine overrun")
          }
        }
      }
      if (eobrun > 0) {
        // correct every nonzero-history coefficient in the rest of the band
        while (k <= se) {
          val z = off + zigzag(k)
          if (c.coefs(z) != 0) {
            if (br.readBit() == 1 && (c.coefs(z) & p1) == 0)
              c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    if (dc && scanComps.length > 1) {
      // interleaved DC scan: MCU geometry (bwFull = mcusX·h for every
      // component, so the MCU grid derives from any of them)
      val mX = scanComps(0).bwFull / scanComps(0).h
      val mY = scanComps(0).bhFull / scanComps(0).v
      var my = 0
      while (my < mY) {
        var mx = 0
        while (mx < mX) {
          maybeRestart()
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val off = ((my * c.v + by) * c.bwFull + (mx * c.h + bx)) * 64
                decodeDcBlock(c, off)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan: raster over the component's own
      // (non-padded) block grid; one block per restart unit
      val c = scanComps(0)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          maybeRestart()
          val off = (by * c.bwFull + bx) * 64
          if (dc) decodeDcBlock(c, off)
          else if (ah == 0) decodeAcFirst(c, off)
          else decodeAcRefine(c, off)
          bx += 1
        }
        by += 1
      }
    }

    // skip padding bits, then find the next real marker
    var q = br.pos
    while (q + 1 < bytes.length &&
      !((bytes(q) & 0xff) == 0xff && (bytes(q + 1) & 0xff) != 0x00)) q += 1
    if (q + 1 >= bytes.length) -1 else q
  }

  /** EOI reached: dequantize the accumulated coefficients, IDCT every
    * block into the planes, and compose exactly like baseline.
    */
  private def finishProgressive(comps: Array[Comp], width: Int, height: Int,
                                quant: Array[Array[Int]]): Pixels = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    comps.foreach { c =>
      val q = quant(c.tq)
      if (q == null) throw new IllegalStateException("missing quant table")
      // natural-order quant table: qNat(zigzag(k)) = q(k)
      val qNat = new Array[Int](64)
      var k = 0
      while (k < 64) { qNat(zigzag(k)) = q(k); k += 1 }
      c.planeW = c.bwFull * 8
      c.planeH = c.bhFull * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var by = 0
      while (by < c.bhFull) {
        var bx = 0
        while (bx < c.bwFull) {
          val off = (by * c.bwFull + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = c.coefs(off + i) * qNat(i); i += 1 }
          idct(coef, block)
          val ox = bx * 8; val oy = by * 8
          var yy = 0
          while (yy < 8) {
            val rowOff = (oy + yy) * c.planeW + ox
            var xx = 0
            while (xx < 8) { c.plane(rowOff + xx) = block(yy * 8 + xx); xx += 1 }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    composePixels(comps, width, height, maxH, maxV)
  }

  /** Resolve a component plane to full W×H resolution. Factor-1 dims
    * crop; factor-2 dims get the centered triangle filter (3:1 weights
    * per axis — 9:3:3:1 for 2×2), edge samples clamped. Sampled
    * logical dims are ceil(W·h/maxH) × ceil(H·v/maxV); the MCU-padded
    * plane beyond them is garbage and never read.
    */
  private def upsample(c: Comp, width: Int, height: Int, maxH: Int, maxV: Int): Array[Int] = {
    val sw = (width * c.h + maxH - 1) / maxH
    val sh = (height * c.v + maxV - 1) / maxV
    val fx = maxH / c.h // 1 or 2
    val fy = maxV / c.v
    if (fx == 1 && fy == 1 && c.planeW == width) return c.plane
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      // vertical: contributing row pair (3:1) or identity
      val sy = if (fy == 1) math.min(y, sh - 1) else math.min(y >> 1, sh - 1)
      val ny = if (fy == 1) sy
        else math.max(0, math.min(sh - 1, sy + (if ((y & 1) == 1) 1 else -1)))
      val r0 = sy * c.planeW
      val r1 = ny * c.planeW
      var x = 0
      while (x < width) {
        val sx = if (fx == 1) math.min(x, sw - 1) else math.min(x >> 1, sw - 1)
        val nx = if (fx == 1) sx
          else math.max(0, math.min(sw - 1, sx + (if ((x & 1) == 1) 1 else -1)))
        val v =
          if (fy == 1 && fx == 1) c.plane(r0 + sx)
          else if (fy == 1) (3 * c.plane(r0 + sx) + c.plane(r0 + nx) + 2) >> 2
          else if (fx == 1) (3 * c.plane(r0 + sx) + c.plane(r1 + sx) + 2) >> 2
          else (9 * c.plane(r0 + sx) + 3 * c.plane(r0 + nx) +
            3 * c.plane(r1 + sx) + c.plane(r1 + nx) + 8) >> 4
        out(y * width + x) = v
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Dequantized-coefficient 8×8 inverse DCT: separable double-
    * precision basis product, half-up round, level shift, clamp.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64) // rows: tmp(u*8+x) = Σ_v C(v)F(u,v)cos_v(x)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += basis(v)(x) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var u2 = 0
        while (u2 < 8) { s += basis(u2)(yy) * tmp(u2 * 8 + xx); u2 += 1 }
        out(yy * 8 + xx) = clamp(math.round(s / 4.0 + 128.0).toInt)
        xx += 1
      }
      yy += 1
    }
  }

  // ---- synthesis encoder ----------------------------------------------

  /** Encode a grid of FLAT 8×8 blocks as a valid baseline 4:4:4 JPEG
    * with all-ones quantization tables. A flat block is DC-only, the
    * DC coefficient 8·(value−128) is exactly representable, and the
    * IDCT of a lone DC lands within 1e-12 of the flat value — so
    * decode reproduces every sample EXACTLY and the q90 oracle can
    * rebuild the statistics from `colors`' arithmetic alone. The
    * decoder sees nothing special: the bytes run the same marker
    * walk, Huffman tables, dequant, IDCT and fixed-point color
    * convert as any camera JPEG (JpegSpec proves that path against
    * the JDK reader separately).
    *
    * `colors(bx, by)` returns (Y, Cb, Cr), each 0..255.
    */
  def encodeFlatBlocks(wBlocks: Int, hBlocks: Int,
                       colors: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }

    marker(0xd8) // SOI
    marker(0xdb); w16(2 + 1 + 64); w8(0x00) // DQT id 0, 8-bit, all ones
    for (_ <- 0 until 64) w8(1)
    marker(0xc0) // SOF0: 8-bit, 3 components, 1x1 sampling, quant 0
    w16(8 + 3 * 3); w8(8); w16(hBlocks * 8); w16(wBlocks * 8); w8(3)
    for (id <- 1 to 3) { w8(id); w8(0x11); w8(0) }
    // DC table 0: categories 0..11 as canonical 5-bit codes
    marker(0xc4); w16(2 + 17 + 12); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 5) 12 else 0)
    for (v <- 0 to 11) w8(v)
    // AC table 0: the single symbol EOB as code '0'
    marker(0xc4); w16(2 + 17 + 1); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 1) 1 else 0)
    w8(0x00)
    marker(0xda) // SOS
    w16(6 + 2 * 3); w8(3)
    for (id <- 1 to 3) { w8(id); w8(0x00) }
    w8(0); w8(63); w8(0)

    // entropy segment: per MCU, per component: DC category+bits, EOB
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00) // stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def category(v: Int): Int = { var a = math.abs(v); var s = 0; while (a != 0) { a >>= 1; s += 1 }; s }
    val pred = new Array[Int](3)
    var by = 0
    while (by < hBlocks) {
      var bx = 0
      while (bx < wBlocks) {
        val (yv, cbv, crv) = colors(bx, by)
        require(yv >= 0 && yv <= 255 && cbv >= 0 && cbv <= 255 && crv >= 0 && crv <= 255,
          "component out of range")
        val dcs = Array(8 * (yv - 128), 8 * (cbv - 128), 8 * (crv - 128))
        var ci = 0
        while (ci < 3) {
          val diff = dcs(ci) - pred(ci); pred(ci) = dcs(ci)
          val s = category(diff)
          putBits(s, 5) // DC table: category c is the 5-bit code c
          if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          putBits(0, 1) // EOB (AC code '0')
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    if (bitCnt > 0) { // pad with 1s
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xff)
      if ((bitBuf & 0xff) == 0xff) out.write(0x00)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode the SAME flat-block image as [[encodeFlatBlocks]] but as
    * a PROGRESSIVE (SOF2) stream exercising every scan kind the
    * decoder implements: an interleaved DC first scan at Al=1, an
    * interleaved DC refinement (raw bits), then per component an AC
    * first scan (Ss=1..63, Al=1) and an AC refinement (Ah=1, Al=0) —
    * with all-zero AC coefficients the AC scans are pure EOB runs,
    * so decoded pixels are EXACTLY the baseline encoder's (DC-only
    * arithmetic the q120 oracle rebuilds in SQL), while the stream
    * itself walks the full progressive control path: successive-
    * approximation DC reassembly ((dc>>1)<<1 | bit), spectral
    * selection, and EOB-run accounting across 8 scans.
    */
  def encodeFlatBlocksProgressive(wBlocks: Int, hBlocks: Int,
                                  colors: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }

    marker(0xd8) // SOI
    marker(0xdb); w16(2 + 1 + 64); w8(0x00) // DQT id 0, 8-bit, all ones
    for (_ <- 0 until 64) w8(1)
    marker(0xc2) // SOF2: progressive, 8-bit, 3 components, 1x1 sampling
    w16(8 + 3 * 3); w8(8); w16(hBlocks * 8); w16(wBlocks * 8); w8(3)
    for (id <- 1 to 3) { w8(id); w8(0x11); w8(0) }
    // DC table 0: categories 0..11 as canonical 5-bit codes
    marker(0xc4); w16(2 + 17 + 12); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 5) 12 else 0)
    for (v <- 0 to 11) w8(v)
    // AC table 0: EOB-run symbols r<<4 (r = 0..14) as 4-bit codes
    marker(0xc4); w16(2 + 17 + 15); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 4) 15 else 0)
    for (r <- 0 to 14) w8(r << 4)

    // per-scan entropy writer (each scan flushes + 1-pads)
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (bitCnt > 0) {
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xff)
      if ((bitBuf & 0xff) == 0xff) out.write(0x00)
      bitBuf = 0; bitCnt = 0
    }
    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda)
      w16(6 + 2 * compIds.size); w8(compIds.size)
      compIds.foreach { id => w8(id); w8(0x00) }
      w8(ss); w8(se); w8((ah << 4) | al)
    }
    def category(v: Int): Int = { var a = math.abs(v); var s = 0; while (a != 0) { a >>= 1; s += 1 }; s }
    def dcOf(bx: Int, by: Int): Array[Int] = {
      val (yv, cbv, crv) = colors(bx, by)
      require(yv >= 0 && yv <= 255 && cbv >= 0 && cbv <= 255 && crv >= 0 && crv <= 255,
        "component out of range")
      Array(8 * (yv - 128), 8 * (cbv - 128), 8 * (crv - 128))
    }

    // scan 1: DC first, interleaved, Al=1 — codes diffs of (dc >> 1)
    sos(Seq(1, 2, 3), 0, 0, 0, 1)
    val pred = new Array[Int](3)
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks) {
      val dcs = dcOf(bx, by)
      for (ci <- 0 until 3) {
        val v = dcs(ci) >> 1 // arithmetic: the successive-approximation division
        val diff = v - pred(ci); pred(ci) = v
        val s = category(diff)
        putBits(s, 5)
        if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
    }
    flush()

    // scan 2: DC refinement, interleaved, Ah=1 Al=0 — raw low bits
    sos(Seq(1, 2, 3), 0, 0, 1, 0)
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks) {
      val dcs = dcOf(bx, by)
      for (ci <- 0 until 3) putBits(dcs(ci) & 1, 1)
    }
    flush()

    // EOB-run covering n blocks: decoder adds (1<<r) + extra blocks
    def eobRuns(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        if (n >= (1 << 15)) {
          putBits(14, 4); putBits((1 << 14) - 1, 14) // covers 2^15 - 1
          n -= (1 << 15) - 1
        } else {
          val r = 31 - Integer.numberOfLeadingZeros(n) // floor(log2 n)
          val extra = n - (1 << r)
          putBits(r, 4) // AC table: symbol r<<4 is the 4-bit code r
          if (r > 0) putBits(extra, r)
          n = 0
        }
      }
    }
    val nBlocks = wBlocks * hBlocks
    // scans 3-5: AC first per component (all-zero band -> pure EOB run)
    for (id <- 1 to 3) {
      sos(Seq(id), 1, 63, 0, 1)
      eobRuns(nBlocks)
      flush()
    }
    // scans 6-8: AC refinement per component (no nonzero history ->
    // EOB runs with zero correction bits)
    for (id <- 1 to 3) {
      sos(Seq(id), 1, 63, 1, 0)
      eobRuns(nBlocks)
      flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** The decoder's exact fixed-point YCbCr→RGB, exposed so specs and
    * the q90 synthesis arithmetic share one definition.
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbv = cb - 128; val crv = cr - 128
    (clamp(y + ((91881 * crv + 32768) >> 16)),
      clamp(y + ((-22554 * cbv - 46802 * crv + 32768) >> 16)),
      clamp(y + ((116130 * cbv + 32768) >> 16)))
  }
}
