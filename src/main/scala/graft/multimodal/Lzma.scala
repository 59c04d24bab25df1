package graft.multimodal

/** LZMA core decoder (the public LZMA SDK specification) — the
  * entropy layer under [[Xz]]'s LZMA2 chunks. Adaptive binary range
  * coding over the standard probability model: `isMatch`/`isRep*`
  * switches indexed by the 12-state machine and position bits,
  * literal coders with the matched-byte context after matches,
  * separate match/rep length coders (low/mid bit-trees per position
  * state + shared high tree), distance slots with reverse bit-tree
  * "SpecPos" models, direct bits, and the 4-bit align tree, plus the
  * rep0–rep3 distance history. One instance decodes one LZMA2 chunk
  * run; [[Xz]] resets state/props/dictionary per the chunk control
  * byte.
  */
private[multimodal] final class Lzma(dict: Lzma.Dict) {
  import Lzma._

  // probability model (2048 = 1/2 in 11-bit fixed point)
  private var lc = 3
  private var lp = 0
  private var pb = 2
  private val isMatch = Array.fill(12 * 16)(1024)
  private val isRep = Array.fill(12)(1024)
  private val isRepG0 = Array.fill(12)(1024)
  private val isRepG1 = Array.fill(12)(1024)
  private val isRepG2 = Array.fill(12)(1024)
  private val isRep0Long = Array.fill(12 * 16)(1024)
  private val posSlot = Array.fill(4 * 64)(1024)
  private val specPos = Array.fill(115)(1024)
  private val align = Array.fill(16)(1024)
  private var literals: Array[Int] = Array.fill(0x300 << (lc + lp))(1024)
  private val matchLen = new LenCoder
  private val repLen = new LenCoder
  private var state = 0
  private var rep0 = 0
  private var rep1 = 0
  private var rep2 = 0
  private var rep3 = 0

  def setProps(props: Int): Unit = {
    require(props < 9 * 5 * 5, "lzma: bad props byte")
    lc = props % 9
    lp = (props / 9) % 5
    pb = props / 45
    require(lc + lp <= 4, "lzma: lc+lp too large")
    literals = Array.fill(0x300 << (lc + lp))(1024)
    resetState()
  }

  def resetState(): Unit = {
    state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
    java.util.Arrays.fill(isMatch, 1024); java.util.Arrays.fill(isRep, 1024)
    java.util.Arrays.fill(isRepG0, 1024); java.util.Arrays.fill(isRepG1, 1024)
    java.util.Arrays.fill(isRepG2, 1024); java.util.Arrays.fill(isRep0Long, 1024)
    java.util.Arrays.fill(posSlot, 1024); java.util.Arrays.fill(specPos, 1024)
    java.util.Arrays.fill(align, 1024)
    java.util.Arrays.fill(literals, 1024)
    matchLen.reset(); repLen.reset()
  }

  /** Decode exactly `outLen` bytes from the chunk's range-coded
    * payload `bytes[off, off+len)`; output lands in the shared dict.
    */
  def decodeChunk(bytes: Array[Byte], off: Int, len: Int, outLen: Int): Unit = {
    val rc = new RangeDecoder(bytes, off, len)
    val target = dict.pos + outLen
    while (dict.pos < target) {
      val posState = dict.pos & ((1 << pb) - 1)
      if (rc.bit(isMatch, state * 16 + posState) == 0) {
        // literal
        val prev = if (dict.pos == 0) 0 else dict.byteAt(1) & 0xff
        val ctx = ((dict.pos & ((1 << lp) - 1)) << lc) + (prev >>> (8 - lc))
        val base = 0x300 * ctx
        var symbol = 1
        if (state >= 7) {
          var matchByte = dict.byteAt(rep0 + 1) & 0xff
          var break = false
          while (!break && symbol < 0x100) {
            val matchBit = (matchByte >> 7) & 1
            matchByte <<= 1
            val bit = rc.bit(literals, base + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | bit
            if (matchBit != bit) break = true
          }
          while (symbol < 0x100) symbol = (symbol << 1) | rc.bit(literals, base + symbol)
        } else {
          while (symbol < 0x100) symbol = (symbol << 1) | rc.bit(literals, base + symbol)
        }
        dict.put((symbol & 0xff).toByte)
        state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
      } else if (rc.bit(isRep, state) == 0) {
        // match: new distance
        rep3 = rep2; rep2 = rep1; rep1 = rep0
        val len0 = matchLen.decode(rc, posState)
        val lenState = math.min(len0 - 2, 3)
        val slot = rc.bitTree(posSlot, lenState * 64, 6)
        if (slot < 4) rep0 = slot
        else {
          val direct = (slot >> 1) - 1
          var dist = (2 | (slot & 1)) << direct
          if (slot < 14) {
            dist += rc.bitTreeReverse(specPos, dist - slot - 1, direct)
          } else {
            dist += rc.directBits(direct - 4) << 4
            dist += rc.bitTreeReverse(align, 0, 4)
          }
          if (dist == -1 || dist == 0xffffffff)
            throw new IllegalStateException("lzma: unexpected end marker")
          rep0 = dist
        }
        state = if (state < 7) 7 else 10
        require(rep0 >= 0 && rep0 < dict.pos, "lzma: distance out of range")
        dict.copyBack(rep0 + 1, len0)
      } else {
        // rep match
        var len0 = 0
        if (rc.bit(isRepG0, state) == 0) {
          if (rc.bit(isRep0Long, state * 16 + posState) == 0) {
            // short rep: one byte at rep0
            state = if (state < 7) 9 else 11
            require(rep0 < dict.pos, "lzma: distance out of range")
            dict.copyBack(rep0 + 1, 1)
            len0 = -1
          }
        } else {
          var dist = 0
          if (rc.bit(isRepG1, state) == 0) dist = rep1
          else {
            if (rc.bit(isRepG2, state) == 0) dist = rep2
            else { dist = rep3; rep3 = rep2 }
            rep2 = rep1
          }
          rep1 = rep0
          rep0 = dist
        }
        if (len0 != -1) {
          len0 = repLen.decode(rc, posState)
          state = if (state < 7) 8 else 11
          require(rep0 < dict.pos, "lzma: distance out of range")
          dict.copyBack(rep0 + 1, len0)
        }
      }
    }
    require(dict.pos == target, "lzma: chunk output overrun")
    rc.finish()
  }
}

private[multimodal] object Lzma {

  /** Shared output window: the whole uncompressed output (we decode
    * in memory, so the dictionary is simply everything so far).
    */
  final class Dict(capacity: Int) {
    var buf = new Array[Byte](math.max(capacity, 64))
    var pos = 0
    private def ensure(extra: Int): Unit =
      if (pos + extra > buf.length) {
        var cap = buf.length * 2
        while (cap < pos + extra) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def byteAt(dist: Int): Byte = {
      require(dist <= pos, "lzma: dictionary underrun")
      if (dist > pos) 0 else buf(pos - dist)
    }
    def put(b: Byte): Unit = { ensure(1); buf(pos) = b; pos += 1 }
    def write(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, pos, n); pos += n
    }
    def copyBack(dist: Int, n: Int): Unit = {
      ensure(n)
      var i = 0
      while (i < n) { buf(pos + i) = buf(pos + i - dist); i += 1 }
      pos += n
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  /** The LZMA binary range decoder. */
  final class RangeDecoder(bytes: Array[Byte], off: Int, len: Int) {
    private var pos = off
    private val end = off + len
    private var range = 0xffffffff
    private var code = 0
    locally {
      require(len >= 5, "lzma: chunk too short")
      require(bytes(off) == 0, "lzma: bad range-coder first byte")
      var i = 0
      pos = off + 1
      while (i < 4) { code = (code << 8) | (bytes(pos) & 0xff); pos += 1; i += 1 }
    }
    private def next(): Int = {
      require(pos < end, "lzma: range coder underrun")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    private def normalize(): Unit =
      if ((range & 0xff000000) == 0) { range <<= 8; code = (code << 8) | next() }

    def bit(probs: Array[Int], idx: Int): Int = {
      val p = probs(idx)
      val bound = (range >>> 11) * p
      // unsigned compare code < bound
      val r =
        if ((code ^ 0x80000000) < (bound ^ 0x80000000)) {
          range = bound
          probs(idx) = p + ((2048 - p) >> 5)
          0
        } else {
          range -= bound
          code -= bound
          probs(idx) = p - (p >> 5)
          1
        }
      normalize()
      r
    }

    def bitTree(probs: Array[Int], base: Int, nBits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nBits) { m = (m << 1) | bit(probs, base + m); i += 1 }
      m - (1 << nBits)
    }

    def bitTreeReverse(probs: Array[Int], base: Int, nBits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nBits) {
        val b = bit(probs, base + m)
        m = (m << 1) | b
        sym |= b << i
        i += 1
      }
      sym
    }

    def directBits(n: Int): Int = {
      var result = 0
      var i = 0
      while (i < n) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31) // 0 if code >= 0 (bit 1), -1 if borrowed (bit 0)
        code += range & t
        result = (result << 1) | (1 + t)
        normalize()
        i += 1
      }
      result
    }

    /** Chunk must consume its payload exactly (code ends 0). */
    def finish(): Unit = {
      require(code == 0 || pos == end, "lzma: chunk not fully consumed")
    }
  }

  /** Match/rep length coder: choice bits + low/mid per-pos-state
    * 3-bit trees + shared 8-bit high tree; lengths start at 2.
    */
  final class LenCoder {
    private val choice = Array(1024, 1024)
    private val low = Array.fill(16 * 8)(1024)
    private val mid = Array.fill(16 * 8)(1024)
    private val high = Array.fill(256)(1024)
    def reset(): Unit = {
      choice(0) = 1024; choice(1) = 1024
      java.util.Arrays.fill(low, 1024)
      java.util.Arrays.fill(mid, 1024)
      java.util.Arrays.fill(high, 1024)
    }
    def decode(rc: RangeDecoder, posState: Int): Int =
      if (rc.bit(choice, 0) == 0) 2 + rc.bitTree(low, posState * 8, 3)
      else if (rc.bit(choice, 1) == 0) 10 + rc.bitTree(mid, posState * 8, 3)
      else 18 + rc.bitTree(high, 0, 8)
  }
}
