package graft.multimodal

/** Entropy layer for [[Zstd]]: the backward bitstream both entropy
  * coders share, FSE (tANS) table build / decode / encode, and the
  * Huffman literals decoder — all from RFC 8878's published
  * algorithms. Kept separate from the frame walk so each layer is
  * testable on its own.
  */
private[multimodal] object ZstdEntropy {

  def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  // ---------------------------------------------------------------- bit io

  /** Backward bitstream reader: written forward, read from the end.
    * The highest set bit of the last byte is the sentinel; `read(n)`
    * consumes the n bits just below the cursor, first-read bit as
    * the MSB of the returned value (bits are numbered little-endian
    * within the byte array).
    */
  final class BackwardBits(bytes: Array[Byte], off: Int, len: Int) {
    require(len > 0, "zstd: empty bitstream")
    private val last = bytes(off + len - 1) & 0xff
    require(last != 0, "zstd: bitstream missing sentinel")
    var pos: Int = (len - 1) * 8 + highBit(last) // bit index of the sentinel

    private def bit(i: Int): Int = (bytes(off + (i >> 3)) >> (i & 7)) & 1

    def read(n: Int): Int = {
      require(n >= 0 && n <= 31, "zstd: bad bit count")
      require(pos - n >= 0, "zstd: bitstream underrun")
      pos -= n
      var v = 0
      var i = 0
      while (i < n) { v |= bit(pos + i) << i; i += 1 }
      v
    }

    def readLong(n: Int): Long = {
      require(n >= 0 && n <= 63, "zstd: bad bit count")
      require(pos - n >= 0, "zstd: bitstream underrun")
      pos -= n
      var v = 0L
      var i = 0
      while (i < n) { v |= bit(pos + i).toLong << i; i += 1 }
      v
    }

    /** Huffman lookahead: n bits below the cursor, zero-padded past
      * the start of the stream (codes are complete, so the pad is
      * never actually consumed).
      */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val idx = pos - n + i
        if (idx >= 0) v |= bit(idx) << i
        i += 1
      }
      v
    }

    def skip(n: Int): Unit = {
      require(pos - n >= 0, "zstd: bitstream underrun")
      pos -= n
    }

    def exhausted: Boolean = pos == 0
  }

  /** Backward bitstream writer: `add(value, n)` appends the n low
    * bits; `finish()` appends the sentinel bit and pads to a byte.
    */
  final class BackwardBitsWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var container = 0L
    private var nBits = 0

    def add(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 56, "zstd: bad bit count")
      container |= (value & ((1L << n) - 1)) << nBits
      nBits += n
      while (nBits >= 8) {
        out.write((container & 0xff).toInt)
        container >>>= 8
        nBits -= 8
      }
    }

    def finish(): Array[Byte] = {
      add(1L, 1) // sentinel
      if (nBits > 0) { out.write((container & 0xff).toInt); container = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Forward little-endian bit reader (FSE table descriptions only). */
  final class ForwardBits(bytes: Array[Byte], off: Int, end: Int) {
    private var bitPos = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val idx = bitPos + i
        val byteIdx = off + (idx >> 3)
        require(byteIdx < end, "zstd: table description truncated")
        v |= ((bytes(byteIdx) >> (idx & 7)) & 1) << i
        i += 1
      }
      bitPos += n
      v
    }
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val idx = bitPos + i
        val byteIdx = off + (idx >> 3)
        if (byteIdx < end) v |= ((bytes(byteIdx) >> (idx & 7)) & 1) << i
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = bitPos += n
    def bytesConsumed: Int = (bitPos + 7) / 8
  }

  // ---------------------------------------------------------------- fse

  /** FSE decoding table: per state, the symbol it emits, the bits to
    * read, and the baseline the read adds to.
    */
  final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                       val nbBits: Array[Int], val baseline: Array[Int])

  /** Spread symbols into the table per the spec: low-probability
    * (-1) symbols one cell each at the END, others stepped by
    * `(size>>1)+(size>>3)+3` skipping occupied tail cells.
    */
  private def spread(norm: Array[Int], accuracyLog: Int): Array[Int] = {
    val size = 1 << accuracyLog
    val table = new Array[Int](size)
    var highThreshold = size - 1
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) { table(highThreshold) = s; highThreshold -= 1 }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < norm.length) {
      if (norm(s) > 0) {
        var i = 0
        while (i < norm(s)) {
          table(pos) = s
          do pos = (pos + step) & mask while (pos > highThreshold)
          i += 1
        }
      }
      s += 1
    }
    require(pos == 0, "zstd: FSE spread did not complete")
    table
  }

  def fseBuildDecodeTable(norm: Array[Int], accuracyLog: Int): FseTable = {
    val size = 1 << accuracyLog
    val cells = spread(norm, accuracyLog)
    val nbBits = new Array[Int](size)
    val baseline = new Array[Int](size)
    val next = new Array[Int](norm.length)
    var s = 0
    while (s < norm.length) {
      next(s) = if (norm(s) == -1) 1 else math.max(norm(s), 0)
      s += 1
    }
    var i = 0
    while (i < size) {
      val sym = cells(i)
      val x = next(sym)
      next(sym) += 1
      nbBits(i) = accuracyLog - highBit(x)
      baseline(i) = (x << nbBits(i)) - size
      i += 1
    }
    new FseTable(accuracyLog, cells, nbBits, baseline)
  }

  /** FSE encoding table (reference FSE_buildCTable): `stateTable`
    * maps occupancy rank → next state value (in [size, 2·size)),
    * `deltaNbBits`/`deltaFindState` drive the per-symbol transition.
    */
  final class FseEncoder(norm: Array[Int], val accuracyLog: Int) {
    private val size = 1 << accuracyLog
    private val stateTable = new Array[Int](size)
    private val deltaNbBits = new Array[Int](norm.length)
    private val deltaFindState = new Array[Int](norm.length)
    locally {
      val cells = spread(norm, accuracyLog)
      val cumul = new Array[Int](norm.length + 1)
      var s = 0
      while (s < norm.length) {
        cumul(s + 1) = cumul(s) + (if (norm(s) == -1) 1 else math.max(norm(s), 0))
        s += 1
      }
      var pos = 0
      while (pos < size) {
        val sym = cells(pos)
        stateTable(cumul(sym)) = size + pos
        cumul(sym) += 1
        pos += 1
      }
      var total = 0
      s = 0
      while (s < norm.length) {
        norm(s) match {
          case 0 =>
            deltaNbBits(s) = ((accuracyLog + 1) << 16) - size // never used
          case -1 | 1 =>
            deltaNbBits(s) = (accuracyLog << 16) - size
            deltaFindState(s) = total - 1
            total += 1
          case c =>
            val maxBitsOut = accuracyLog - highBit(c - 1)
            deltaNbBits(s) = (maxBitsOut << 16) - (c << maxBitsOut)
            deltaFindState(s) = total - c
            total += c
        }
        s += 1
      }
    }
    private var state = 0

    def init(symbol: Int): Unit = {
      val nbBitsOut = (deltaNbBits(symbol) + (1 << 15)) >> 16
      val value = (nbBitsOut << 16) - deltaNbBits(symbol)
      state = stateTable((value >> nbBitsOut) + deltaFindState(symbol))
    }

    def encode(w: BackwardBitsWriter, symbol: Int): Unit = {
      val nbBitsOut = (state + deltaNbBits(symbol)) >> 16
      w.add(state.toLong, nbBitsOut)
      state = stateTable((state >> nbBitsOut) + deltaFindState(symbol))
    }

    def flush(w: BackwardBitsWriter): Unit = w.add(state.toLong, accuracyLog)
  }

  /** Read an FSE table description (RFC §4.1.1): 4-bit
    * `Accuracy_Log - 5`, then variable-width probabilities with the
    * small-value-one-less-bit scheme and 2-bit zero-repeat runs.
    * Returns (normalized counts, accuracy log, bytes consumed).
    */
  def fseReadTableDescription(bytes: Array[Byte], off: Int, end: Int,
                              maxAccuracyLog: Int, maxSymbol: Int): (Array[Int], Int, Int) = {
    val bits = new ForwardBits(bytes, off, end)
    val accuracyLog = bits.read(4) + 5
    require(accuracyLog <= maxAccuracyLog, "zstd: accuracy log too large")
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    val norm = Array.newBuilder[Int]
    var count = 0
    while (remaining > 1) {
      require(count <= maxSymbol, "zstd: too many FSE symbols")
      val max = remaining // values 0..max are possible (probability+1)
      val nb = highBit(max) + 1
      val low = bits.peek(nb) & ((1 << (nb - 1)) - 1)
      val cutoff = (1 << nb) - 1 - max
      val value =
        if (low < cutoff) { bits.skip(nb - 1); low }
        else {
          val full = bits.peek(nb); bits.skip(nb)
          if (full >= (1 << (nb - 1))) full - cutoff else full
        }
      val prob = value - 1 // -1 encodes "less than one"
      norm += prob
      count += 1
      remaining -= (if (prob == -1) 1 else prob)
      if (prob == 0) {
        var rep = bits.read(2)
        var total = rep
        while (rep == 3) { rep = bits.read(2); total += rep }
        var i = 0
        while (i < total) { norm += 0; count += 1; i += 1 }
      }
    }
    require(remaining == 1, "zstd: FSE probabilities overshoot")
    (norm.result(), accuracyLog, bits.bytesConsumed)
  }

  // ---------------------------------------------------------------- huffman

  /** Huffman decoding table built from weights: single-level lookup
    * of `tableLog` bits (≤ 11), lowest weights filled first per the
    * reference layout.
    */
  final class HufTable(val tableLog: Int, val symbol: Array[Int], val nbBits: Array[Int])

  def hufBuildDecodeTable(weights: Array[Int]): HufTable = {
    // implied last weight: completes the kraft sum to a power of two
    var sum = 0L
    weights.foreach { w =>
      require(w >= 0 && w <= 11, "zstd: bad huffman weight")
      if (w > 0) sum += 1L << (w - 1)
    }
    require(sum > 0, "zstd: empty huffman weights")
    val tableLog = highBit(sum.toInt) + 1
    require(tableLog <= 11, "zstd: huffman table log too large")
    val rest = (1L << tableLog) - sum
    require(rest > 0 && (rest & (rest - 1)) == 0, "zstd: huffman weights do not complete")
    val lastWeight = highBit(rest.toInt) + 1
    val all = weights :+ lastWeight
    val size = 1 << tableLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    var pos = 0
    var w = 1
    while (w <= tableLog) {
      var s = 0
      while (s < all.length) {
        if (all(s) == w) {
          val len = 1 << (w - 1)
          val bits = tableLog + 1 - w
          var i = 0
          while (i < len) { symbol(pos) = s; nbBits(pos) = bits; pos += 1; i += 1 }
        }
        s += 1
      }
      w += 1
    }
    require(pos == size, "zstd: huffman table incomplete")
    new HufTable(tableLog, symbol, nbBits)
  }

  /** Decode one backward Huffman stream into exactly `outLen` bytes. */
  def hufDecodeStream(table: HufTable, bytes: Array[Byte], off: Int, len: Int,
                      out: Array[Byte], outOff: Int, outLen: Int): Unit = {
    val bits = new BackwardBits(bytes, off, len)
    var produced = 0
    while (produced < outLen) {
      val idx = bits.peek(table.tableLog)
      bits.skip(table.nbBits(idx))
      out(outOff + produced) = table.symbol(idx).toByte
      produced += 1
    }
    require(bits.exhausted, "zstd: huffman stream not fully consumed")
  }

  /** Read a Huffman tree description: direct 4-bit weights
    * (header ≥ 128) or FSE-compressed weights with two interleaved
    * states. Returns (decode table, bytes consumed incl. header).
    */
  def hufReadTable(bytes: Array[Byte], off: Int, end: Int): (HufTable, Int) = {
    require(off < end, "zstd: missing huffman header")
    val header = bytes(off) & 0xff
    if (header >= 128) {
      val n = header - 127
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = bytes(off + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) b >> 4 else b & 0xf
        i += 1
      }
      (hufBuildDecodeTable(weights), 1 + (n + 1) / 2)
    } else {
      val compSize = header
      require(off + 1 + compSize <= end, "zstd: truncated huffman weights")
      val (norm, al, descBytes) =
        fseReadTableDescription(bytes, off + 1, off + 1 + compSize, 6, 255)
      val table = fseBuildDecodeTable(norm, al)
      val streamOff = off + 1 + descBytes
      val streamLen = compSize - descBytes
      val bits = new BackwardBits(bytes, streamOff, streamLen)
      var s1 = bits.read(al)
      var s2 = bits.read(al)
      val weights = Array.newBuilder[Int]
      var n = 0
      var done = false
      while (!done) {
        weights += table.symbol(s1); n += 1
        require(n <= 255, "zstd: too many huffman weights")
        if (bits.pos < table.nbBits(s1)) { weights += table.symbol(s2); n += 1; done = true }
        else {
          s1 = table.baseline(s1) + bits.read(table.nbBits(s1))
          weights += table.symbol(s2); n += 1
          require(n <= 255, "zstd: too many huffman weights")
          if (bits.pos < table.nbBits(s2)) { weights += table.symbol(s1); n += 1; done = true }
          else s2 = table.baseline(s2) + bits.read(table.nbBits(s2))
        }
      }
      (hufBuildDecodeTable(weights.result()), 1 + compSize)
    }
  }
}
