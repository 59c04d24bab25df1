package graft.multimodal

/** WebP LOSSLESS (VP8L) codec — RIFF container walk plus the full
  * VP8L bitstream from the public specification (RFC 9649 / the WebP
  * Lossless Bitstream Specification), pure JVM: LSB-first bit
  * reading, canonical prefix codes (simple and normal forms, the
  * 19-symbol code-length code with its fixed permutation, repeat
  * codes 16/17/18, the optional max_symbol field), LZ77 over ARGB
  * pixels with prefix-coded lengths/distances and the 120-entry
  * close-neighbor distance mapping (generated from its closed form:
  * all (dx, dy), dy ∈ [0,7], dx ∈ [-7,8], above-or-left, ordered by
  * squared distance then descending dy then positive-dx-first —
  * WebpSpec pins sampled entries against the spec's printed table),
  * the color cache (0x1e35a7bd multiplicative hash), and all four
  * transforms' inverses: PREDICTOR (14 modes with the spec's edge
  * rules), COLOR (signed 3.5 fixed-point cross-channel deltas),
  * SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette with
  * sub-byte packing at ≤16 entries).
  *
  * The ENCODER emits a conformant subset used by q158's synthesis
  * oracle: literal pixels under real frequency-built length-limited
  * prefix codes, optional SUBTRACT_GREEN / single-tile PREDICTOR /
  * COLOR_INDEXING transforms, optional color cache (greedy hits) and
  * run-length LZ77 backrefs (1-D distance codes). WebpSpec
  * round-trips the full knob space and hand-builds bit-exact
  * fixtures straight from the spec text, so the reader is checked
  * against the document, not just our own writer.
  *
  * Never throws on foreign bytes: malformed input yields
  * `valid=false` (the multimodal decode-kernel contract; fuzzed).
  */
object Webp {

  final case class WebpInfo(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long,
                            peak: Int, hasAlpha: Boolean, valid: Boolean)

  private val Invalid = WebpInfo(0, 0, 0L, 0L, 0L, 0, hasAlpha = false, valid = false)

  def decode(bytes: Array[Byte]): WebpInfo =
    decodePixels(bytes) match {
      case None => Invalid
      case Some((w, h, px)) =>
        var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
        var hasAlpha = false
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val r = (p >>> 16) & 0xff; val g = (p >>> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          if (r > peak) peak = r
          if (g > peak) peak = g
          if (b > peak) peak = b
          if (((p >>> 24) & 0xff) != 0xff) hasAlpha = true
          i += 1
        }
        WebpInfo(w, h, sr, sg, sb, peak, hasAlpha, valid = true)
    }

  /** Full ARGB pixel decode; None on anything malformed. Catches
    * Throwable, not just Exception: the crawl contract is
    * never-throw, and adversarial bytes can surface as
    * StackOverflowError or OutOfMemoryError despite the allocation
    * guard — an invalid row beats a dead executor.
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try Some(decodeUnsafe(bytes))
    catch { case _: Throwable => None }

  // --------------------------------------------------------- bit reader
  /** VP8L reads values LSB-first: the first bit read is the lowest
    * bit of the value.
    */
  private final class Br(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        require(pos < b.length, "vp8l: truncated")
        v |= (((b(pos) >> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def bit1(): Int = bits(1)
  }

  // ------------------------------------------------------ prefix codes
  /** Canonical prefix-code decoder: DEFLATE-style code assignment
    * (codes increase with length, symbols ascending within a length),
    * walked bit-by-bit (each read bit extends the code at the LSB
    * end of the stream but the MSB end of the code — the spec's
    * `code = (code << 1) | ReadBits(1)` loop).
    */
  private final class Huff(lengths: Array[Int]) {
    val maxLen: Int = lengths.max
    require(maxLen > 0, "vp8l: empty code")
    // first code value and first symbol index per length
    private val (firstCode, firstSym, symsByLen) = {
      val counts = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) counts(l) += 1)
      val fc = new Array[Int](maxLen + 2)
      var code = 0
      var l = 1
      while (l <= maxLen) { fc(l) = code; code = (code + counts(l)) << 1; l += 1 }
      // Kraft check: complete or single-symbol degenerate
      val kraft = (1 to maxLen).map(l => counts(l).toLong << (maxLen - l)).sum
      val nSyms = lengths.count(_ > 0)
      require(nSyms == 1 || kraft == (1L << maxLen), "vp8l: incomplete code")
      val fs = new Array[Int](maxLen + 1)
      var acc = 0
      l = 1
      while (l <= maxLen) { fs(l) = acc; acc += counts(l); l += 1 }
      val syms = new Array[Int](acc)
      val next = fs.clone()
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { syms(next(len)) = s; next(len) += 1 }
        s += 1
      }
      (fc, fs, syms)
    }
    /** Single-symbol codes consume ZERO bits per read (the spec's
      * degenerate-code rule) — detected here so simple one-symbol and
      * normal one-symbol codes behave identically.
      */
    private val single: Int = if (lengths.count(_ > 0) == 1) lengths.indexWhere(_ > 0) else -1

    def read(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit1()
        len += 1
        val cnt = countAt(len)
        if (cnt > 0 && code - firstCode(len) < cnt)
          return symsByLen(firstSym(len) + (code - firstCode(len)))
      }
      throw new IllegalStateException("vp8l: bad code")
    }
    private def countAt(len: Int): Int =
      (if (len < maxLen) firstSym(len + 1) else symsByLen.length) - firstSym(len)
  }

  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code, simple or normal form. */
  private def readCode(br: Br, alphabetSize: Int): Huff = {
    if (br.bit1() == 1) {
      // simple
      val numSymbols = br.bit1() + 1
      val is8 = br.bit1()
      val s0 = br.bits(if (is8 == 1) 8 else 1)
      require(s0 < alphabetSize, "vp8l: simple symbol out of range")
      val lens = new Array[Int](alphabetSize)
      lens(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.bits(8)
        require(s1 < alphabetSize && s1 != s0, "vp8l: bad simple pair")
        lens(s1) = 1
      }
      new Huff(lens)
    } else {
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      require(clLens.exists(_ > 0), "vp8l: empty code-length code")
      val cl = new Huff(clLens)
      var maxSymbol = alphabetSize
      if (br.bit1() == 1) {
        val nbits = 2 + 2 * br.bits(3)
        maxSymbol = 2 + br.bits(nbits)
      }
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        cl.read(br) match {
          case x if x < 16 =>
            lens(sym) = x; sym += 1
            if (x != 0) prev = x
          case 16 =>
            val rep = 3 + br.bits(2)
            var j = 0
            while (j < rep && sym < alphabetSize) { lens(sym) = prev; sym += 1; j += 1 }
          case 17 =>
            sym += 3 + br.bits(3)
          case 18 =>
            sym += 11 + br.bits(7)
          case other => throw new IllegalStateException(s"vp8l: cl $other")
        }
      }
      require(sym <= alphabetSize, "vp8l: code lengths overflow")
      require(lens.exists(_ > 0), "vp8l: no symbols")
      new Huff(lens)
    }
  }

  // ------------------------------------------------- distance mapping
  /** The 120 close-neighbor (dx, dy) codes, generated from the
    * closed form behind the spec's printed table.
    */
  private[multimodal] val PlaneCodes: Array[(Int, Int)] = {
    val all = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    all.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }.toArray
  }

  /** `distCode` is the 1-based prefix-decoded value: 1..120 index the
    * close-neighbor table; above 120 the distance is distCode − 120.
    */
  private def planeDistance(distCode: Int, width: Int): Int = {
    require(distCode >= 1, "vp8l: bad distance code")
    if (distCode > 120) distCode - 120
    else {
      val (dx, dy) = PlaneCodes(distCode - 1)
      math.max(dy * width + dx, 1)
    }
  }

  private def prefixValue(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  // -------------------------------------------------- entropy image
  private def colorCacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private final case class Group(green: Huff, red: Huff, blue: Huff, alpha: Huff, dist: Huff)

  /** Decode an entropy-coded pixel image (the ARGB image or any
    * subimage). Per spec EVERY image stream carries the color-cache
    * flag; only the top-level (`main`) stream may carry the
    * meta-prefix image.
    */
  private def decodeEntropyImage(br: Br, width: Int, height: Int, main: Boolean): Array[Int] = {
    val cacheBits = if (br.bit1() == 1) {
      val cb = br.bits(4)
      require(cb >= 1 && cb <= 11, s"vp8l: cache bits $cb")
      cb
    } else 0
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null

    val (metaHuff, metaBits, nGroups) =
      if (main && br.bit1() == 1) {
        val hb = 2 + br.bits(3)
        val mw = subSize(width, hb)
        val mh = subSize(height, hb)
        val img = decodeEntropyImage(br, mw, mh, main = false)
        var maxIdx = 0
        val meta = img.map { p =>
          val idx = ((p >>> 8) & 0xffff)
          if (idx > maxIdx) maxIdx = idx
          idx
        }
        (meta, hb, maxIdx + 1)
      } else (null, 0, 1)

    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val groups = Array.fill(nGroups) {
      val g = readCode(br, 256 + 24 + cacheSize)
      val r = readCode(br, 256)
      val b = readCode(br, 256)
      val a = readCode(br, 256)
      val d = readCode(br, 40)
      Group(g, r, b, a, d)
    }

    val out = new Array[Int](width * height)
    var n = 0
    while (n < width * height) {
      val x = n % width
      val y = n / width
      val grp =
        if (metaHuff == null) groups(0)
        else groups(metaHuff((y >> metaBits) * subSize(width, metaBits) + (x >> metaBits)))
      val s = grp.green.read(br)
      if (s < 256) {
        val red = grp.red.read(br)
        val blue = grp.blue.read(br)
        val alpha = grp.alpha.read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(n) = px
        if (cache != null) cache(colorCacheHash(px, cacheBits)) = px
        n += 1
      } else if (s < 256 + 24) {
        val length = prefixValue(s - 256, br)
        val distCode = prefixValue(grp.dist.read(br), br)
        val dist = planeDistance(distCode, width)
        require(dist <= n, s"vp8l: back reference beyond start")
        require(n + length <= width * height, "vp8l: back reference overruns image")
        var i = 0
        while (i < length) {
          val px = out(n - dist)
          out(n) = px
          if (cache != null) cache(colorCacheHash(px, cacheBits)) = px
          n += 1; i += 1
        }
      } else {
        require(cache != null, "vp8l: cache symbol without cache")
        val idx = s - 256 - 24
        require(idx < cacheSize, "vp8l: cache index out of range")
        out(n) = cache(idx)
        n += 1
      }
    }
    out
  }

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  // ------------------------------------------------------- transforms
  private def avg2(a: Int, b: Int): Int = {
    // per-channel average
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = ((a & 0xff00ff00) >>> 8) + ((b & 0xff00ff00) >>> 8)
    ((ag & 0x00ff00ff) << 8) | rb
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 =>
      def ch(p: Int, s: Int) = (p >>> s) & 0xff
      var pl = 0; var pt = 0
      var s = 0
      while (s < 32) {
        val p = ch(l, s) + ch(t, s) - ch(tl, s)
        pl += math.abs(p - ch(l, s))
        pt += math.abs(p - ch(t, s))
        s += 8
      }
      if (pl <= pt) l else t
    case 12 =>
      def ch(p: Int, s: Int) = (p >>> s) & 0xff
      var out = 0
      var s = 0
      while (s < 32) {
        out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
        s += 8
      }
      out
    case 13 =>
      def ch(p: Int, s: Int) = (p >>> s) & 0xff
      val a = avg2(l, t)
      var out = 0
      var s = 0
      while (s < 32) {
        val c = ch(a, s)
        val d = ch(tl, s)
        out |= clamp255(c + (c - d) / 2) << s
        s += 8
      }
      out
    case other => throw new IllegalStateException(s"vp8l: predictor $other")
  }

  /** Predictor inverse: pixel = residual + prediction (per-channel
    * modular), with the spec's edge rules overriding tile modes.
    */
  private[multimodal] def applyPredictorInverse(px: Array[Int], w: Int, h: Int,
                                                tiles: Array[Int], tileBits: Int): Unit = {
    val tw = subSize(w, tileBits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // top row: Left
          else if (x == 0) px(i - w) // left column: Top
          else {
            val mode = (tiles((y >> tileBits) * tw + (x >> tileBits)) >>> 8) & 0xff
            val l = px(i - 1)
            val t = px(i - w)
            val tl = px(i - w - 1)
            // i - w + 1 is the pixel to the upper right — and for the
            // rightmost column it lands on the FIRST pixel of the
            // CURRENT row (already decoded), which is exactly the
            // reference decoder's contiguous-buffer behavior.
            val tr = px(i - w + 1)
            predict(mode, l, t, tl, tr)
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
  }

  private def s8(v: Int): Int = v.toByte.toInt

  private def colorDelta(t: Int, c: Int): Int = (s8(t) * s8(c)) >> 5

  /** Color-transform inverse per tile element (green_to_red in blue
    * byte, green_to_blue in green byte, red_to_blue in red byte).
    */
  private[multimodal] def applyColorInverse(px: Array[Int], w: Int, h: Int,
                                            tiles: Array[Int], tileBits: Int): Unit = {
    val tw = subSize(w, tileBits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val te = tiles((y >> tileBits) * tw + (x >> tileBits))
        val g2r = te & 0xff
        val g2b = (te >>> 8) & 0xff
        val r2b = (te >>> 16) & 0xff
        val p = px(i)
        val g = (p >>> 8) & 0xff
        var r = (p >>> 16) & 0xff
        var b = p & 0xff
        r = (r + colorDelta(g2r, g)) & 0xff
        b = (b + colorDelta(g2b, g)) & 0xff
        b = (b + colorDelta(r2b, r)) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private[multimodal] def applySubtractGreenInverse(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  // ----------------------------------------------------------- decode
  private def decodeUnsafe(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 30, "webp: too short")
    def tag(off: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => bytes(off + i) == c.toByte }
    require(tag(0, "RIFF") && tag(8, "WEBP"), "webp: bad container")
    // find the VP8L chunk
    var off = 12
    var vp8lOff = -1
    var vp8lLen = -1
    while (vp8lOff < 0 && off + 8 <= bytes.length) {
      val size = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
        ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
      require(size >= 0 && off + 8 + size <= bytes.length, "webp: bad chunk size")
      if (tag(off, "VP8L")) { vp8lOff = off + 8; vp8lLen = size }
      else off += 8 + size + (size & 1)
    }
    require(vp8lOff > 0, "webp: no VP8L chunk (lossy not supported)")
    require((bytes(vp8lOff) & 0xff) == 0x2f, "vp8l: bad signature")
    val br = new Br(bytes, vp8lOff + 1)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    // Allocation guard BEFORE any w*h-sized array exists: one VP8L
    // symbol can paint at most a 4096-pixel backward reference and
    // costs at least a bit, and the color-indexing transform can
    // bundle up to 8 pixels into one coded pixel, so a stream of
    // `vp8lLen` bytes can never legitimately decode more than
    // len*8*4096*8 pixels — a lying 16383x16383 header on a tiny
    // chunk still dies here as invalid instead of attempting a 1 GiB
    // allocation, while a maximally-bundled palette image passes.
    require(w.toLong * h <= vp8lLen.toLong * 8L * 4096L * 8L,
      "vp8l: claimed dimensions exceed payload capacity")
    br.bit1() // alpha hint
    require(br.bits(3) == 0, "vp8l: version")

    // transforms
    var haveSubGreen = false
    var predTiles: Array[Int] = null
    var predBits = 0
    var colorTiles: Array[Int] = null
    var colorBits = 0
    var palette: Array[Int] = null
    var packedWidth = w
    var packBits = 0
    val seen = scala.collection.mutable.Set.empty[Int]
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (br.bit1() == 1) {
      val t = br.bits(2)
      require(seen.add(t), s"vp8l: duplicate transform $t")
      order += t
      t match {
        case 0 => // predictor
          predBits = 2 + br.bits(3)
          predTiles = decodeEntropyImage(br, subSize(packedWidth, predBits), subSize(h, predBits),
            main = false)
        case 1 => // color
          colorBits = 2 + br.bits(3)
          colorTiles = decodeEntropyImage(br, subSize(packedWidth, colorBits), subSize(h, colorBits),
            main = false)
        case 2 => haveSubGreen = true
        case 3 => // color indexing
          val size = br.bits(8) + 1
          val raw = decodeEntropyImage(br, size, 1, main = false)
          // palette entries are delta-coded per channel
          palette = new Array[Int](size)
          var prev = 0
          var i = 0
          while (i < size) { prev = addPixels(prev, raw(i)); palette(i) = prev; i += 1 }
          packBits = if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0
          packedWidth = subSize(w, packBits)
      }
    }

    var px = decodeEntropyImage(br, packedWidth, h, main = true)

    // inverse transforms in reverse read order
    order.reverse.foreach {
      case 0 => applyPredictorInverse(px, packedWidth, h, predTiles, predBits)
      case 1 => applyColorInverse(px, packedWidth, h, colorTiles, colorBits)
      case 2 => applySubtractGreenInverse(px)
      case 3 =>
        val out = new Array[Int](w * h)
        val perByte = 1 << packBits
        val idxBits = 8 >> packBits
        val mask = (1 << idxBits) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = px(y * packedWidth + x / perByte)
            val sub = x % perByte
            val idx = ((packed >>> 8) & 0xff) >>> (sub * idxBits) & mask
            require(idx < palette.length, "vp8l: palette index out of range")
            out(y * w + x) = palette(idx)
            x += 1
          }
          y += 1
        }
        px = out
    }
    require(px.length == w * h, "vp8l: size mismatch after transforms")
    (w, h, px)
  }

  // ================================================================ encode
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** A canonical prefix code: MSB of the code first. */
    def code(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((v >>> i) & 1, 1); i -= 1 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(cur); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** Length-limited Huffman lengths (two-queue build + the classic
    * halve-frequencies rebuild until the depth cap holds).
    */
  private def huffLengths(freq0: Array[Long], maxLen: Int): Array[Int] = {
    val n = freq0.length
    val used = freq0.count(_ > 0)
    val lens = new Array[Int](n)
    if (used == 0) return lens
    if (used == 1) { lens(freq0.indexWhere(_ > 0)) = 1; return lens }
    var freq = freq0.clone()
    var ok = false
    while (!ok) {
      java.util.Arrays.fill(lens, 0)
      final case class Node(weight: Long, depth: Int, leaves: List[Int])
      val pq = new scala.collection.mutable.PriorityQueue[Node]()(
        Ordering.by[Node, (Long, Int)](nd => (nd.weight, nd.depth)).reverse)
      var i = 0
      while (i < n) { if (freq(i) > 0) pq.enqueue(Node(freq(i), 0, List(i))); i += 1 }
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        (a.leaves ++ b.leaves).foreach(lens(_) += 1)
        pq.enqueue(Node(a.weight + b.weight, math.max(a.depth, b.depth) + 1, a.leaves ++ b.leaves))
      }
      if (lens.max <= maxLen) ok = true
      else freq = freq.map(f => if (f > 0) (f + 1) / 2 else 0L)
    }
    lens
  }

  /** Canonical code values from lengths — the decoder's assignment. */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.max
    val counts = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) { next(l) = code; code = (code + counts(l)) << 1; l += 1 }
    val out = new Array[Int](lens.length)
    var s = 0
    while (s < lens.length) {
      if (lens(s) > 0) { out(s) = next(lens(s)); next(lens(s)) += 1 }
      s += 1
    }
    out
  }

  /** Emit one prefix-code definition (simple form when it fits, else
    * the normal code-length-coded form without repeats).
    */
  private def writeCodeDef(bw: Bw, lens: Array[Int]): Unit = {
    val used = lens.indices.filter(lens(_) > 0)
    if (used.size <= 2 && used.forall(_ < 256) && used.nonEmpty) {
      bw.bits(1, 1) // simple
      bw.bits(used.size - 1, 1)
      if (used.head <= 1 && used.size == 1) { bw.bits(0, 1); bw.bits(used.head, 1) }
      else { bw.bits(1, 1); bw.bits(used.head, 8) }
      if (used.size == 2) bw.bits(used(1), 8)
    } else {
      bw.bits(0, 1) // normal
      // CL code over the length symbols actually present (incl. 0 runs
      // written literally — no 16/17/18 on the encode side)
      val clFreq = new Array[Long](19)
      lens.foreach(l => clFreq(l) += 1)
      val clLens = huffLengths(clFreq, 7)
      val clCodes = canonicalCodes(clLens)
      bw.bits(19 - 4, 4) // num_code_lengths = 19
      ClOrder.foreach(s => bw.bits(clLens(s), 3))
      bw.bits(0, 1) // no max_symbol
      val clSingle = clLens.count(_ > 0) == 1
      lens.foreach { l =>
        if (!clSingle) bw.code(clCodes(l), clLens(l))
      }
    }
  }

  private final class CodeSet(lens: Array[Int]) {
    private val codes = canonicalCodes(lens)
    private val zero = lens.count(_ > 0) == 1
    def emit(bw: Bw, sym: Int): Unit = {
      require(lens(sym) > 0, s"vp8l: emitting symbol $sym with no code")
      if (!zero) bw.code(codes(sym), lens(sym))
    }
  }

  /** Inverse of prefixValue: (prefix code, extra bits, extra count). */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"vp8l: prefix value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      val u = v - 1
      val h = 31 - Integer.numberOfLeadingZeros(u)
      val extra = h - 1
      val slot = (u >>> extra) - 2
      (2 * extra + 2 + slot, u & ((1 << extra) - 1), extra)
    }
  }

  private sealed trait Tok
  private final case class TLit(px: Int) extends Tok
  private final case class TCache(idx: Int) extends Tok
  private final case class TCopy(len: Int, distCode: Int) extends Tok

  /** Emit one entropy-coded image (the spec subset: single group, an
    * optional color cache, optional run-length LZ77 with 1-D
    * distance codes).
    */
  private def writeEntropyImage(bw: Bw, px: Array[Int], main: Boolean,
                                cacheBits: Int, lz77: Boolean): Unit = {
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) } else bw.bits(0, 1)
    if (main) bw.bits(0, 1) // no meta prefix image
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    val cacheUsed = if (cacheBits > 0) new Array[Boolean](cacheSize) else null

    // tokenize
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < px.length) {
      val p = px(i)
      if (lz77 && i > 0 && px(i - 1) == p) {
        var len = 0
        while (len < 4096 && i + len < px.length && px(i + len) == p) len += 1
        toks += TCopy(len, 120 + 1) // distance 1, 1-D code
        // decoder inserts every copied pixel into the cache
        if (cache != null) {
          val hsh = colorCacheHash(p, cacheBits)
          cache(hsh) = p; cacheUsed(hsh) = true
        }
        i += len
      } else {
        val hsh = if (cache != null) colorCacheHash(p, cacheBits) else 0
        if (cache != null && cacheUsed(hsh) && cache(hsh) == p) {
          toks += TCache(hsh)
          i += 1
        } else {
          toks += TLit(p)
          if (cache != null) { cache(hsh) = p; cacheUsed(hsh) = true }
          i += 1
        }
      }
    }

    // frequencies
    val gFreq = new Array[Long](256 + 24 + cacheSize)
    val rFreq = new Array[Long](256)
    val bFreq = new Array[Long](256)
    val aFreq = new Array[Long](256)
    val dFreq = new Array[Long](40)
    toks.foreach {
      case TLit(p) =>
        gFreq((p >>> 8) & 0xff) += 1
        rFreq((p >>> 16) & 0xff) += 1
        bFreq(p & 0xff) += 1
        aFreq((p >>> 24) & 0xff) += 1
      case TCache(idx) => gFreq(280 + idx) += 1
      case TCopy(len, dc) =>
        gFreq(256 + prefixEncode(len)._1) += 1
        dFreq(prefixEncode(dc)._1) += 1
    }
    // every code must be present; give empty alphabets a dummy symbol
    if (gFreq.forall(_ == 0)) gFreq(0) = 1
    Seq(rFreq, bFreq, aFreq, dFreq).foreach(f => if (f.forall(_ == 0)) f(0) = 1)

    val gl = huffLengths(gFreq, 15); val gs = new CodeSet(gl)
    val rl = huffLengths(rFreq, 15); val rs = new CodeSet(rl)
    val bl = huffLengths(bFreq, 15); val bs = new CodeSet(bl)
    val al = huffLengths(aFreq, 15); val as = new CodeSet(al)
    val dl = huffLengths(dFreq, 15); val ds = new CodeSet(dl)
    writeCodeDef(bw, gl); writeCodeDef(bw, rl); writeCodeDef(bw, bl)
    writeCodeDef(bw, al); writeCodeDef(bw, dl)

    toks.foreach {
      case TLit(p) =>
        gs.emit(bw, (p >>> 8) & 0xff)
        rs.emit(bw, (p >>> 16) & 0xff)
        bs.emit(bw, p & 0xff)
        as.emit(bw, (p >>> 24) & 0xff)
      case TCache(idx) => gs.emit(bw, 280 + idx)
      case TCopy(len, dc) =>
        val (lc, lx, ln) = prefixEncode(len)
        gs.emit(bw, 256 + lc)
        if (ln > 0) bw.bits(lx, ln)
        val (dcc, dx, dn) = prefixEncode(dc)
        ds.emit(bw, dcc)
        if (dn > 0) bw.bits(dx, dn)
    }
  }

  private def subPixels(a: Int, b: Int): Int = {
    // per-channel modular subtract a - b
    var out = 0
    var s = 0
    while (s < 32) {
      out |= ((((a >>> s) & 0xff) - ((b >>> s) & 0xff)) & 0xff) << s
      s += 8
    }
    out
  }

  /** Encode ARGB pixels as a lossless WebP. `palette` is exclusive
    * with the other transforms (encoder contract; the decoder
    * handles any combination).
    */
  def encode(width: Int, height: Int, argb: Array[Int],
             subtractGreen: Boolean = false, predictor: Boolean = false,
             palette: Boolean = false, cacheBits: Int = 0,
             lz77: Boolean = false): Array[Byte] = {
    require(width >= 1 && width <= 512 && height >= 1 && height <= 16384,
      s"webp encoder: dims $width x $height (single predictor tile caps width at 512)")
    require(argb.length == width * height, "webp: pixel count")
    require(!(palette && (subtractGreen || predictor)), "webp: palette is exclusive")
    require(cacheBits >= 0 && cacheBits <= 11, s"webp: cache bits $cacheBits")
    val bw = new Bw
    bw.bits(width - 1, 14)
    bw.bits(height - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version

    var px = argb.clone()
    var codedWidth = width
    if (palette) {
      val distinct = scala.collection.immutable.ListMap.from(
        px.distinct.zipWithIndex)
      require(distinct.size <= 256, s"webp: palette too big (${distinct.size})")
      val entries = distinct.keys.toArray
      val packBits = if (entries.length <= 2) 3 else if (entries.length <= 4) 2
        else if (entries.length <= 16) 1 else 0
      val perByte = 1 << packBits
      val idxBits = 8 >> packBits
      codedWidth = subSize(width, packBits)
      val packed = new Array[Int](codedWidth * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < codedWidth) {
          var byteVal = 0
          var s = 0
          while (s < perByte && x * perByte + s < width) {
            byteVal |= distinct(argb(y * width + x * perByte + s)) << (s * idxBits)
            s += 1
          }
          packed(y * codedWidth + x) = 0xff000000 | (byteVal << 8)
          x += 1
        }
        y += 1
      }
      // transform header + delta-coded palette as a 1xN subimage
      bw.bits(1, 1); bw.bits(3, 2)
      bw.bits(entries.length - 1, 8)
      val deltas = new Array[Int](entries.length)
      var prev = 0
      var i = 0
      while (i < entries.length) { deltas(i) = subPixels(entries(i), prev); prev = entries(i); i += 1 }
      writeEntropyImage(bw, deltas, main = false, cacheBits = 0, lz77 = false)
      px = packed
    }
    if (subtractGreen) {
      bw.bits(1, 1); bw.bits(2, 2)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
    }
    if (predictor) {
      // one 512-wide tile, mode 2 (Top) — edge rules shared with the
      // decoder, residuals per-channel modular
      bw.bits(1, 1); bw.bits(0, 2)
      bw.bits(7, 3) // size_bits = 9 → 512-pixel tiles
      writeEntropyImage(bw, Array(0xff000000 | (2 << 8)), main = false, cacheBits = 0, lz77 = false)
      val res = new Array[Int](px.length)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < codedWidth) {
          val i = y * codedWidth + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) px(i - 1)
            else if (x == 0) px(i - codedWidth)
            else predict(2, px(i - 1), px(i - codedWidth), px(i - codedWidth - 1),
              px(i - codedWidth + 1))
          res(i) = subPixels(px(i), pred)
          x += 1
        }
        y += 1
      }
      px = res
    }
    bw.bits(0, 1) // no more transforms
    writeEntropyImage(bw, px, main = true, cacheBits = cacheBits, lz77 = lz77)
    val payload = bw.finish()

    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    val vp8lSize = payload.length + 1
    val riffSize = 4 + 8 + vp8lSize + (vp8lSize & 1)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    u32(riffSize)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('L')
    u32(vp8lSize)
    out.write(0x2f)
    out.write(payload, 0, payload.length)
    if ((vp8lSize & 1) == 1) out.write(0)
    out.toByteArray
  }
}
