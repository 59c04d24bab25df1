package graft.multimodal

/** Raw Snappy block codec (Google's format_description.txt) in pure
  * JVM — the block compression Avro / Parquet / Hadoop actually use
  * to ship training-data containers. LZ77-family: a stream is the
  * uncompressed length as a little-endian base-128 varint, then
  * literal runs and back-references tagged by the low two bits of
  * each element byte (00 literal, 01 copy/1-byte offset, 10
  * copy/2-byte offset, 11 copy/4-byte offset); copies may overlap
  * their own output (offset < length ⇒ run replication), which is
  * how `aaaa…` compresses to one literal + one copy. The encoder is
  * a greedy hash-table match finder (4-byte probes, 64-byte max per
  * copy op — long matches re-emit copies, the format's own idiom);
  * the decoder is exact and bounds-checked, throwing on any
  * malformed stream (callers map to valid=false). SnappySpec
  * cross-checks snappy-java in BOTH directions.
  */
object Snappy {

  /** Compress with a greedy 4-byte hash matcher. Output is valid
    * Snappy any decoder accepts; ratio is within a few percent of
    * the reference encoder on text.
    */
  def compress(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    writeUvarint(out, in.length.toLong)
    val hashBits = 14
    val table = new Array[Int](1 << hashBits) // candidate position + 1; 0 = empty
    def hash4(p: Int): Int = {
      val v = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) |
        ((in(p + 2) & 0xff) << 16) | ((in(p + 3) & 0xff) << 24)
      (v * 0x1e35a7bd) >>> (32 - hashBits)
    }
    var litStart = 0
    var pos = 0
    def emitLiteral(from: Int, until: Int): Unit = {
      var len = until - from
      var off = from
      while (len > 0) {
        val n = math.min(len, 0x10000) // any size works; cap keeps extra bytes ≤ 3
        if (n <= 60) out.write(((n - 1) << 2))
        else if (n <= 0x100) { out.write(60 << 2); out.write(n - 1) }
        else if (n <= 0x10000) { out.write(61 << 2); out.write((n - 1) & 0xff); out.write(((n - 1) >> 8) & 0xff) }
        out.write(in, off, n)
        off += n; len -= n
      }
    }
    def emitCopy(offset: Int, length: Int): Unit = {
      var len = length
      while (len > 0) {
        // prefer copy2 (len 1..64); copy1 only for the short-offset case
        val n = math.min(len, 64)
        // avoid leaving a tail of < 4 that copy1 couldn't express — harmless
        // for copy2 (min len 1), so no special-casing needed
        if (n >= 4 && n <= 11 && offset < 2048) {
          out.write(1 | ((n - 4) << 2) | ((offset >> 8) << 5))
          out.write(offset & 0xff)
        } else {
          out.write(2 | ((n - 1) << 2))
          out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        }
        len -= n
      }
    }
    while (pos + 4 <= in.length) {
      val h = hash4(pos)
      val cand = table(h) - 1
      table(h) = pos + 1
      if (cand >= 0 && pos - cand <= 0xffff &&
        in(cand) == in(pos) && in(cand + 1) == in(pos + 1) &&
        in(cand + 2) == in(pos + 2) && in(cand + 3) == in(pos + 3)) {
        emitLiteral(litStart, pos)
        var m = 4
        while (pos + m < in.length && in(cand + m) == in(pos + m)) m += 1
        emitCopy(pos - cand, m)
        pos += m
        litStart = pos
      } else pos += 1
    }
    emitLiteral(litStart, in.length)
    out.toByteArray
  }

  /** Decompress; throws IllegalStateException on any malformed input. */
  def uncompress(in: Array[Byte]): Array[Byte] = {
    var pos = 0
    def u8(): Int = {
      if (pos >= in.length) throw new IllegalStateException("snappy: truncated")
      val v = in(pos) & 0xff; pos += 1; v
    }
    // uncompressed length varint
    var expected = 0L
    var shift = 0
    var more = true
    while (more) {
      val b = u8()
      expected |= (b & 0x7fL) << shift
      shift += 7
      if (shift > 35) throw new IllegalStateException("snappy: bad length varint")
      more = (b & 0x80) != 0
    }
    // a valid stream can't inflate more than ~255x per byte; anything
    // bigger is a crafted length claim, not data
    if (expected > Int.MaxValue - 8 || expected > 256L * in.length + 64)
      throw new IllegalStateException("snappy: length too large")
    val out = new Array[Byte](expected.toInt)
    var op = 0
    while (pos < in.length) {
      val tag = u8()
      (tag & 3) match {
        case 0 =>
          var len = tag >>> 2
          if (len >= 60) {
            val extra = len - 59 // 1..4 bytes little-endian
            len = 0
            var i = 0
            while (i < extra) { len |= u8() << (8 * i); i += 1 }
          }
          len += 1
          if (pos + len > in.length || op + len > out.length)
            throw new IllegalStateException("snappy: literal out of range")
          System.arraycopy(in, pos, out, op, len)
          pos += len; op += len
        case t =>
          val (len, offset) = t match {
            case 1 => (((tag >>> 2) & 7) + 4, ((tag >>> 5) << 8) | u8())
            case 2 => ((tag >>> 2) + 1, u8() | (u8() << 8))
            case _ => ((tag >>> 2) + 1, u8() | (u8() << 8) | (u8() << 16) | (u8() << 24))
          }
          if (offset <= 0 || offset > op || op + len > out.length)
            throw new IllegalStateException("snappy: copy out of range")
          var i = 0
          while (i < len) { out(op + i) = out(op + i - offset); i += 1 } // overlap-safe
          op += len
      }
    }
    if (op != out.length) throw new IllegalStateException("snappy: short output")
    out
  }

  private def writeUvarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
}
