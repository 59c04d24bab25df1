package graft.multimodal

/** bzip2 in pure JVM — the compression Wikipedia dumps and many
  * classic corpus releases ship in (`.xml.bz2`). The pipeline from
  * the public format: RLE1 (4-byte runs + count byte) → Burrows-
  * Wheeler transform → move-to-front → zero-run coding in bijective
  * base 2 (RUNA/RUNB) → per-group canonical Huffman over a sparse
  * symbol map, all bit-packed MSB-first with NOTHING byte-aligned —
  * blocks start at arbitrary bit offsets behind the 48-bit π magic
  * and end at the 48-bit √π footer. The decoder implements the whole
  * walk: symbol-map ranges, selector MTF, delta-coded code lengths,
  * the limit/base/perm canonical decode, bijective run expansion,
  * inverse BWT via the T-vector, RLE1 expansion, and BOTH CRC layers
  * VERIFIED (bzip2's MSB-first CRC-32 per block and the rotating
  * combined stream CRC); concatenated streams (pbzip2 layout) are
  * supported. The encoder is complete and genuine — rotation-sort
  * BWT, MTF, run coding, real Huffman lengths (depth-limited by
  * frequency halving, bzlib's own trick), two identical groups to
  * satisfy the 2-group minimum — so reference decoders accept its
  * output. Malformed input throws; callers map to valid=false.
  * Bzip2Spec cross-checks commons-compress in BOTH directions.
  */
object Bzip2 {

  private final val BlockMagic = 0x314159265359L
  private final val FooterMagic = 0x177245385090L
  private final val MaxOutput = 1 << 28

  // ---------------------------------------------------------------- crc

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  /** bzip2's CRC-32: MSB-first bit order (unlike zlib's). */
  private final class Crc {
    private var v = 0xffffffff
    def update(b: Byte): Unit = v = (v << 8) ^ CrcTable(((v >>> 24) ^ (b & 0xff)) & 0xff)
    def value: Int = ~v
  }

  // ---------------------------------------------------------------- bit io

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0L // bit index, MSB-first
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val idx = pos + i
        val byteIdx = (idx >> 3).toInt
        require(byteIdx < bytes.length, "bzip2: truncated")
        v = (v << 1) | ((bytes(byteIdx) >> (7 - (idx & 7).toInt)) & 1)
        i += 1
      }
      pos += n
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | read(1); i += 1 }
      v
    }
    def alignByte(): Unit = if ((pos & 7) != 0) pos += 8 - (pos & 7)
    def eof: Boolean = (pos >> 3) >= bytes.length
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def write(value: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nAcc += 1
        if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def writeLong(value: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { write(((value >> i) & 1L).toInt, 1); i -= 1 }
    }
    def finish(): Array[Byte] = {
      if (nAcc > 0) { out.write(acc << (8 - nAcc)); acc = 0; nAcc = 0 }
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------- read

  final case class Bzip2Info(data: Array[Byte], nStreams: Long, nBlocks: Long, level: Int)

  /** Decode one or more concatenated bzip2 streams; throws on
    * anything malformed, including either CRC layer.
    */
  def decompress(bytes: Array[Byte]): Bzip2Info = {
    val out = new java.io.ByteArrayOutputStream()
    val in = new BitReader(bytes)
    var nStreams = 0L
    var nBlocks = 0L
    var level = 0
    while (!in.eof) {
      require(in.read(8) == 'B' && in.read(8) == 'Z' && in.read(8) == 'h', "bzip2: bad magic")
      val lvl = in.read(8) - '0'
      require(lvl >= 1 && lvl <= 9, "bzip2: bad level")
      level = lvl
      var combined = 0
      var footer = false
      while (!footer) {
        val magic = in.readLong(48)
        if (magic == FooterMagic) {
          val streamCrc = in.read(32)
          require(streamCrc == combined, "bzip2: stream CRC mismatch")
          in.alignByte()
          footer = true
        } else {
          require(magic == BlockMagic, "bzip2: bad block magic")
          val blockCrc = decodeBlock(in, lvl, out)
          combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
          nBlocks += 1
        }
      }
      nStreams += 1
    }
    require(nStreams > 0, "bzip2: empty input")
    Bzip2Info(out.toByteArray, nStreams, nBlocks, level)
  }

  /** One block after its magic; returns the block CRC (verified). */
  private def decodeBlock(in: BitReader, level: Int,
                          out: java.io.ByteArrayOutputStream): Int = {
    val storedCrc = in.read(32)
    require(in.read(1) == 0, "bzip2: deprecated randomized blocks not supported")
    val origPtr = in.read(24)
    // symbol map: 16 range bits, then 16 bits per used range
    val ranges = in.read(16)
    val used = Array.newBuilder[Int]
    var r = 0
    while (r < 16) {
      if (((ranges >> (15 - r)) & 1) != 0) {
        val bitsR = in.read(16)
        var b = 0
        while (b < 16) {
          if (((bitsR >> (15 - b)) & 1) != 0) used += (r * 16 + b)
          b += 1
        }
      }
      r += 1
    }
    val mtfInit = used.result()
    val nUsed = mtfInit.length
    require(nUsed > 0, "bzip2: empty symbol map")
    val alphaSize = nUsed + 2
    val nGroups = in.read(3)
    require(nGroups >= 2 && nGroups <= 6, "bzip2: bad group count")
    val nSelectors = in.read(15)
    require(nSelectors > 0, "bzip2: no selectors")
    // selectors, MTF-coded over group ids
    val selMtf = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSelectors)
    var i = 0
    while (i < nSelectors) {
      var j = 0
      while (in.read(1) == 1) { j += 1; require(j < nGroups, "bzip2: bad selector") }
      val g = selMtf(j)
      while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
      selMtf(0) = g
      selectors(i) = g
      i += 1
    }
    // per-group delta-coded lengths → canonical decode tables
    val limit = Array.ofDim[Int](nGroups, 25)
    val base = Array.ofDim[Int](nGroups, 25)
    val perm = Array.ofDim[Int](nGroups, alphaSize)
    val minLens = new Array[Int](nGroups)
    var g = 0
    while (g < nGroups) {
      val lens = new Array[Int](alphaSize)
      var len = in.read(5)
      var s = 0
      while (s < alphaSize) {
        var more = true
        while (more) {
          require(len >= 1 && len <= 20, "bzip2: bad code length")
          if (in.read(1) == 0) more = false
          else if (in.read(1) == 0) len += 1
          else len -= 1
        }
        lens(s) = len
        s += 1
      }
      // build limit/base/perm (bzlib hbCreateDecodeTables)
      val minLen = lens.min
      val maxLen = lens.max
      minLens(g) = minLen
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        var sym = 0
        while (sym < alphaSize) {
          if (lens(sym) == l) { perm(g)(pp) = sym; pp += 1 }
          sym += 1
        }
        l += 1
      }
      val cnt = new Array[Int](25)
      lens.foreach(l0 => cnt(l0 + 1) += 1)
      var k = 1
      while (k < 25) { cnt(k) += cnt(k - 1); k += 1 }
      var vec = 0
      l = minLen
      while (l <= maxLen) {
        vec += cnt(l + 1) - cnt(l)
        limit(g)(l) = vec - 1
        vec <<= 1
        l += 1
      }
      l = minLen + 1
      while (l <= maxLen) {
        base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
        l += 1
      }
      g += 1
    }
    // MTF + RLE2 decode into the BWT string
    val maxBlock = level * 100000
    val bwt = new Array[Byte](maxBlock + 1)
    var nblock = 0
    val mtf = mtfInit.clone()
    val eob = alphaSize - 1
    var groupPos = 0
    var groupNo = -1
    var curGroup = 0
    def nextSym(): Int = {
      if (groupPos == 0) {
        groupNo += 1
        require(groupNo < nSelectors, "bzip2: selectors exhausted")
        curGroup = selectors(groupNo)
        groupPos = 50
      }
      groupPos -= 1
      var zn = minLens(curGroup)
      var zvec = in.read(zn)
      while (zvec > limit(curGroup)(zn)) {
        zn += 1
        require(zn <= 23, "bzip2: code overlong")
        zvec = (zvec << 1) | in.read(1)
      }
      perm(curGroup)(zvec - base(curGroup)(zn))
    }
    var sym = nextSym()
    while (sym != eob) {
      if (sym <= 1) { // RUNA / RUNB: bijective base-2 run of mtf[0]
        var run = 0L
        var k2 = 0
        while (sym <= 1) {
          run += (sym + 1).toLong << k2
          k2 += 1
          require(k2 < 40, "bzip2: run too long")
          sym = nextSym()
        }
        require(nblock + run <= maxBlock, "bzip2: block overflow")
        val b0 = mtf(0).toByte
        var q = 0L
        while (q < run) { bwt(nblock) = b0; nblock += 1; q += 1 }
      } else {
        val idx = sym - 1
        require(idx < nUsed, "bzip2: mtf index out of range")
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        require(nblock < maxBlock, "bzip2: block overflow")
        bwt(nblock) = v.toByte
        nblock += 1
        sym = nextSym()
      }
    }
    require(nblock > 0, "bzip2: empty block")
    require(origPtr < nblock, "bzip2: origPtr out of range")
    // inverse BWT via the T vector
    val cftab = new Array[Int](257)
    i = 0
    while (i < nblock) { cftab((bwt(i) & 0xff) + 1) += 1; i += 1 }
    i = 1
    while (i < 257) { cftab(i) += cftab(i - 1); i += 1 }
    val tt = new Array[Int](nblock)
    i = 0
    while (i < nblock) {
      val b = bwt(i) & 0xff
      tt(cftab(b)) = i
      cftab(b) += 1
      i += 1
    }
    // RLE1 expansion with CRC over the expanded bytes
    val crc = new Crc
    var p = tt(origPtr)
    var runByte = -1
    var runLen = 0
    var pending = -1 // bytes remaining from a run count byte
    var emitted = 0
    i = 0
    while (i < nblock) {
      val b = bwt(p) & 0xff
      p = tt(p)
      if (pending >= 0) {
        var q = 0
        while (q < b) { out.write(runByte); crc.update(runByte.toByte); emitted += 1; q += 1 }
        require(emitted <= MaxOutput, "bzip2: output too large")
        pending = -1
        runByte = -1
        runLen = 0
      } else {
        out.write(b)
        crc.update(b.toByte)
        emitted += 1
        require(emitted <= MaxOutput, "bzip2: output too large")
        if (b == runByte) {
          runLen += 1
          if (runLen == 4) pending = 0 // next decoded byte is the count
        } else {
          runByte = b
          runLen = 1
        }
      }
      i += 1
    }
    require(pending < 0, "bzip2: dangling run count")
    require(crc.value == storedCrc, "bzip2: block CRC mismatch")
    storedCrc
  }

  // ---------------------------------------------------------------- write

  /** Encode one bzip2 stream at the given level. Input is split into
    * blocks by POST-RLE1 size (the format's own bound).
    */
  def compress(in: Array[Byte], level: Int = 1): Array[Byte] = {
    require(level >= 1 && level <= 9, "bzip2: bad level")
    val w = new BitWriter
    w.write('B', 8); w.write('Z', 8); w.write('h', 8); w.write('0' + level, 8)
    val maxBlock = level * 100000 - 19 // bzlib's own safety margin
    var combined = 0
    var pos = 0
    if (in.isEmpty) {
      // empty stream: footer only
    }
    do {
      // RLE1-encode greedily until the block is full (or input ends)
      val rle = new java.io.ByteArrayOutputStream()
      val crc = new Crc
      while (pos < in.length && rle.size < maxBlock) {
        var run = 1
        val b = in(pos)
        while (pos + run < in.length && in(pos + run) == b && run < 255) run += 1
        val take = math.min(run, 251 + 4)
        if (take >= 4) {
          rle.write(b); rle.write(b); rle.write(b); rle.write(b)
          rle.write(take - 4)
        } else {
          var q = 0
          while (q < take) { rle.write(b); q += 1 }
        }
        var q = 0
        while (q < take) { crc.update(b); q += 1 }
        pos += take
      }
      if (rle.size > 0) {
        val blockCrc = crc.value
        combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
        encodeBlock(w, rle.toByteArray, blockCrc)
      }
    } while (pos < in.length)
    w.writeLong(FooterMagic, 48)
    w.write(combined, 32)
    w.finish()
  }

  private def encodeBlock(w: BitWriter, block: Array[Byte], blockCrc: Int): Unit = {
    val n = block.length
    // BWT via cyclic prefix doubling (Manber-Myers): O(n log n) with
    // counting sorts, immune to the periodic inputs that send a
    // rotation-comparator quadratic
    val idx = sortRotations(block)
    var origPtr = -1
    val bwt = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = idx(i)
      if (s == 0) origPtr = i
      bwt(i) = block((s + n - 1) % n)
      i += 1
    }
    // symbol map
    val usedByte = new Array[Boolean](256)
    block.foreach(b => usedByte(b & 0xff) = true)
    val mtfInit = (0 until 256).filter(usedByte).toArray
    val nUsed = mtfInit.length
    val alphaSize = nUsed + 2
    val eob = alphaSize - 1
    // MTF + RLE2
    val symList = Array.newBuilder[Int]
    val mtf = mtfInit.clone()
    var zeroRun = 0L
    def flushZeros(): Unit = {
      var run = zeroRun
      while (run > 0) {
        val d = ((run - 1) & 1L).toInt // bijective base-2 digit: 0 → RUNA, 1 → RUNB
        symList += d
        run = (run - 1) >> 1
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val b = bwt(i) & 0xff
      var j = 0
      while (mtf(j) != b) j += 1
      if (j == 0) zeroRun += 1
      else {
        flushZeros()
        symList += (j + 1)
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = b
      }
      i += 1
    }
    flushZeros()
    symList += eob
    val symbols = symList.result()
    // Huffman lengths (single table used by both mandatory groups),
    // depth-limited by bzlib's frequency-halving trick
    val freq = new Array[Long](alphaSize)
    symbols.foreach(freq(_) += 1)
    var lens = huffmanLengths(freq.map(f => math.max(f, 1L)))
    while (lens.max > 20) {
      var k = 0
      while (k < alphaSize) { freq(k) = math.max(1L, freq(k) / 2); k += 1 }
      lens = huffmanLengths(freq)
    }
    // canonical code assignment: by (length, symbol order)
    val code = new Array[Int](alphaSize)
    var vec = 0
    var l = lens.min
    while (l <= lens.max) {
      var s = 0
      while (s < alphaSize) {
        if (lens(s) == l) { code(s) = vec; vec += 1 }
        s += 1
      }
      vec <<= 1
      l += 1
    }
    // ---- emit
    w.writeLong(BlockMagic, 48)
    w.write(blockCrc, 32)
    w.write(0, 1) // not randomized
    w.write(origPtr, 24)
    val rangesUsed = (0 until 16).map(r => (r * 16 until r * 16 + 16).exists(usedByte))
    var rbits = 0
    rangesUsed.foreach(u => rbits = (rbits << 1) | (if (u) 1 else 0))
    w.write(rbits, 16)
    var r = 0
    while (r < 16) {
      if (rangesUsed(r)) {
        var bits = 0
        var b = 0
        while (b < 16) { bits = (bits << 1) | (if (usedByte(r * 16 + b)) 1 else 0); b += 1 }
        w.write(bits, 16)
      }
      r += 1
    }
    val nGroups = 2 // format minimum; both groups carry the same table
    val nSelectors = (symbols.length + 49) / 50
    w.write(nGroups, 3)
    w.write(nSelectors, 15)
    var sl = 0
    while (sl < nSelectors) { w.write(0, 1); sl += 1 } // selector 0, MTF zero bits
    var g = 0
    while (g < nGroups) {
      var cur = lens(0)
      w.write(cur, 5)
      var s = 0
      while (s < alphaSize) {
        while (cur < lens(s)) { w.write(2, 2); cur += 1 } // 10 = increment
        while (cur > lens(s)) { w.write(3, 2); cur -= 1 } // 11 = decrement
        w.write(0, 1) // done
        s += 1
      }
      g += 1
    }
    symbols.foreach(s => w.write(code(s), lens(s)))
  }

  /** Sort all cyclic rotations of `block` (prefix doubling with
    * counting sorts): returns rotation start indices in sorted order.
    */
  private def sortRotations(block: Array[Byte]): Array[Int] = {
    val n = block.length
    if (n == 0) return Array.empty
    var p = new Array[Int](n) // rotation indices in current order
    var c = new Array[Int](n) // equivalence class per rotation
    // round 0: sort by first byte
    val cnt0 = new Array[Int](256)
    var i = 0
    while (i < n) { cnt0(block(i) & 0xff) += 1; i += 1 }
    i = 1
    while (i < 256) { cnt0(i) += cnt0(i - 1); i += 1 }
    i = n - 1
    while (i >= 0) { cnt0(block(i) & 0xff) -= 1; p(cnt0(block(i) & 0xff)) = i; i -= 1 }
    c(p(0)) = 0
    i = 1
    while (i < n) {
      c(p(i)) = c(p(i - 1)) + (if (block(p(i)) != block(p(i - 1))) 1 else 0)
      i += 1
    }
    var classes = c(p(n - 1)) + 1
    var len = 1
    val pn = new Array[Int](n)
    val cn = new Array[Int](n)
    while (len < n && classes < n) {
      // shift: rotation starting at p[i]-len now has its second half sorted
      i = 0
      while (i < n) {
        pn(i) = p(i) - len
        if (pn(i) < 0) pn(i) += n
        i += 1
      }
      // stable counting sort by class of the first half
      val cnt = new Array[Int](classes)
      i = 0
      while (i < n) { cnt(c(pn(i))) += 1; i += 1 }
      i = 1
      while (i < classes) { cnt(i) += cnt(i - 1); i += 1 }
      i = n - 1
      while (i >= 0) { cnt(c(pn(i))) -= 1; p(cnt(c(pn(i)))) = pn(i); i -= 1 }
      // recompute classes over (first, second) half pairs
      cn(p(0)) = 0
      i = 1
      while (i < n) {
        val cur = (c(p(i)), c((p(i) + len) % n))
        val prev = (c(p(i - 1)), c((p(i - 1) + len) % n))
        cn(p(i)) = cn(p(i - 1)) + (if (cur != prev) 1 else 0)
        i += 1
      }
      System.arraycopy(cn, 0, c, 0, n)
      classes = c(p(n - 1)) + 1
      len <<= 1
    }
    p
  }

  /** Huffman code lengths from frequencies (simple two-queue build). */
  private def huffmanLengths(freq: Array[Long]): Array[Int] = {
    val n = freq.length
    if (n == 1) return Array(1)
    final case class Node(weight: Long, depth: Int, leaves: List[Int])
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(
      Ordering.by[Node, (Long, Int)](nd => (nd.weight, nd.depth)).reverse)
    var i = 0
    while (i < n) { pq.enqueue(Node(freq(i), 0, List(i))); i += 1 }
    val lens = new Array[Int](n)
    while (pq.size > 1) {
      val a = pq.dequeue()
      val b = pq.dequeue()
      (a.leaves ++ b.leaves).foreach(lens(_) += 1)
      pq.enqueue(Node(a.weight + b.weight, math.max(a.depth, b.depth) + 1, a.leaves ++ b.leaves))
    }
    lens
  }
}
