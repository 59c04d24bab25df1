package graft.multimodal

/** LZ4 block + frame codec (lz4.github.io's public block/frame specs)
  * in pure JVM — with gzip, the outer compression crawl dumps and
  * dataset releases actually arrive in (`.tar.lz4`, `.warc.lz4`,
  * Kafka payloads). Block format: token-driven sequences (4-bit
  * literal length + 4-bit match length, 255-byte extensions, 2-byte
  * little-endian offsets, overlap-replicating copies, minmatch 4);
  * the encoder is a greedy hash matcher honoring the spec's
  * end-of-block rules (last sequence literals-only, matches end ≥ 12
  * bytes from the end). Frame format: the `0x184D2204` magic, FLG/BD
  * descriptor with the xxHash32 HEADER CHECKSUM verified (second
  * byte of the hash — our own xxHash32, implemented from the
  * published algorithm), block framing with the high-bit
  * stored/compressed flag, optional per-block xxHash32 VERIFIED,
  * the zero EndMark, and the optional content checksum + content
  * size both VERIFIED. Malformed input (bad magic, bad HC, offset
  * past history, lying lengths, checksum mismatches, truncation)
  * throws; callers map to valid=false. Lz4Spec cross-checks
  * lz4-java (block AND frame) in both directions, and our xxHash32
  * against net.jpountz's.
  */
object Lz4 {

  // ---------------------------------------------------------------- xxhash32

  private final val P1 = 0x9e3779b1 // 2654435761
  private final val P2 = 0x85ebca77 // 2246822519
  private final val P3 = 0xc2b2ae3d // 3266489917
  private final val P4 = 0x27d4eb2f // 668265263
  private final val P5 = 0x165667b1 // 374761393

  /** xxHash32 from the published spec; all arithmetic wraps mod 2^32. */
  def xxhash32(in: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    import java.lang.Integer.rotateLeft
    def lane(p: Int): Int =
      (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) |
        ((in(p + 2) & 0xff) << 16) | ((in(p + 3) & 0xff) << 24)
    var pos = off
    val end = off + len
    var h =
      if (len >= 16) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (pos + 16 <= end) {
          a1 = rotateLeft(a1 + lane(pos) * P2, 13) * P1
          a2 = rotateLeft(a2 + lane(pos + 4) * P2, 13) * P1
          a3 = rotateLeft(a3 + lane(pos + 8) * P2, 13) * P1
          a4 = rotateLeft(a4 + lane(pos + 12) * P2, 13) * P1
          pos += 16
        }
        rotateLeft(a1, 1) + rotateLeft(a2, 7) + rotateLeft(a3, 12) + rotateLeft(a4, 18)
      } else seed + P5
    h += len
    while (pos + 4 <= end) { h = rotateLeft(h + lane(pos) * P3, 17) * P4; pos += 4 }
    while (pos < end) { h = rotateLeft(h + (in(pos) & 0xff) * P5, 11) * P1; pos += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  // ---------------------------------------------------------------- block

  /** Compress one block (greedy 4-byte-hash matcher). */
  def compressBlock(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length + in.length / 255 + 16)
    val hashBits = 14
    val table = new Array[Int](1 << hashBits)
    def hash4(p: Int): Int = {
      val v = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) |
        ((in(p + 2) & 0xff) << 16) | ((in(p + 3) & 0xff) << 24)
      (v * 0x1e35a7bd) >>> (32 - hashBits)
    }
    def writeLen(base: Int): Unit = { // 255-byte extension run after a 15 nibble
      var v = base
      while (v >= 255) { out.write(255); v -= 255 }
      out.write(v)
    }
    def emit(litFrom: Int, litUntil: Int, matchLen: Int, offset: Int): Unit = {
      val litLen = litUntil - litFrom
      val litNib = math.min(litLen, 15)
      val mlNib = if (matchLen == 0) 0 else math.min(matchLen - 4, 15)
      out.write((litNib << 4) | mlNib)
      if (litNib == 15) writeLen(litLen - 15)
      out.write(in, litFrom, litLen)
      if (matchLen > 0) {
        out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        if (mlNib == 15) writeLen(matchLen - 4 - 15)
      }
    }
    // spec end rules: matches must end ≥ 12 bytes before block end and
    // the last 5 bytes are literals — stop matching near the end.
    val matchLimit = in.length - 12
    var litStart = 0
    var pos = 0
    while (pos < matchLimit) {
      val h = hash4(pos)
      val cand = table(h) - 1
      table(h) = pos + 1
      if (cand >= 0 && pos - cand <= 0xffff &&
        in(cand) == in(pos) && in(cand + 1) == in(pos + 1) &&
        in(cand + 2) == in(pos + 2) && in(cand + 3) == in(pos + 3)) {
        var m = 4
        while (pos + m < matchLimit + 7 && pos + m < in.length && in(cand + m) == in(pos + m)) m += 1
        // keep the match's end ≥ 12 from block end per the spec
        val maxM = in.length - 12 - pos + 7 // == matchLimit + 7 - pos
        if (maxM >= 4) {
          val take = math.min(m, maxM)
          if (take >= 4) {
            emit(litStart, pos, take, pos - cand)
            pos += take
            litStart = pos
          } else pos += 1
        } else pos += 1
      } else pos += 1
    }
    emit(litStart, in.length, 0, 0) // final literals-only sequence
    out.toByteArray
  }

  /** Decompress one block into exactly `expectedLen` bytes; throws on
    * any malformed sequence.
    */
  def decompressBlock(in: Array[Byte], off: Int, len: Int, expectedLen: Int): Array[Byte] = {
    val out = new Array[Byte](expectedLen)
    var pos = off
    val end = off + len
    var op = 0
    def u8(): Int = {
      if (pos >= end) throw new IllegalStateException("lz4: truncated block")
      val v = in(pos) & 0xff; pos += 1; v
    }
    def extLen(nibble: Int): Int = {
      var v = nibble
      if (nibble == 15) {
        var b = 255
        while (b == 255) { b = u8(); v += b }
      }
      v
    }
    var done = false
    while (!done) {
      val token = u8()
      val litLen = extLen(token >>> 4)
      if (pos + litLen > end || op + litLen > expectedLen)
        throw new IllegalStateException("lz4: literal out of range")
      System.arraycopy(in, pos, out, op, litLen)
      pos += litLen; op += litLen
      if (pos == end) done = true // last sequence is literals-only
      else {
        val offset = u8() | (u8() << 8)
        if (offset <= 0 || offset > op) throw new IllegalStateException("lz4: bad offset")
        val matchLen = extLen(token & 15) + 4
        if (op + matchLen > expectedLen) throw new IllegalStateException("lz4: match overruns")
        var i = 0
        while (i < matchLen) { out(op + i) = out(op + i - offset); i += 1 } // overlap-safe
        op += matchLen
      }
    }
    if (op != expectedLen) throw new IllegalStateException("lz4: short block output")
    out
  }

  // ---------------------------------------------------------------- frame

  final val FrameMagic = 0x184d2204

  /** Write an LZ4 frame. Blocks of `blockSize` bytes (≤ 64 KB — BD
    * code 4); each block is stored uncompressed when compression
    * doesn't shrink it (the high-bit flag), exactly as real writers
    * do.
    */
  def compressFrame(in: Array[Byte], blockSize: Int = 0x10000,
                    blockChecksum: Boolean = false, contentChecksum: Boolean = true,
                    contentSize: Boolean = false): Array[Byte] = {
    require(blockSize >= 1 && blockSize <= 0x10000, "blockSize must be in [1, 64K]")
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 64)
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    u32(FrameMagic)
    val flg = (1 << 6) | (1 << 5) | // version 01, block-independent
      (if (blockChecksum) 1 << 4 else 0) |
      (if (contentSize) 1 << 3 else 0) |
      (if (contentChecksum) 1 << 2 else 0)
    val desc = new java.io.ByteArrayOutputStream()
    desc.write(flg)
    desc.write(4 << 4) // BD: block maxsize code 4 = 64 KB
    if (contentSize) {
      var v = in.length.toLong
      var i = 0
      while (i < 8) { desc.write((v & 0xff).toInt); v >>>= 8; i += 1 }
    }
    val db = desc.toByteArray
    out.write(db)
    out.write((xxhash32(db, 0, db.length, 0) >>> 8) & 0xff) // HC byte
    var pos = 0
    while (pos < in.length) {
      val n = math.min(blockSize, in.length - pos)
      val chunk = java.util.Arrays.copyOfRange(in, pos, pos + n)
      val packed = compressBlock(chunk)
      if (packed.length < n) {
        u32(packed.length)
        out.write(packed)
        if (blockChecksum) u32(xxhash32(packed, 0, packed.length, 0))
      } else {
        u32(n | 0x80000000) // stored
        out.write(chunk)
        if (blockChecksum) u32(xxhash32(chunk, 0, chunk.length, 0))
      }
      pos += n
    }
    u32(0) // EndMark
    if (contentChecksum) u32(xxhash32(in, 0, in.length, 0))
    out.toByteArray
  }

  final case class FrameInfo(data: Array[Byte], nBlocks: Long, nStored: Long,
                             blockChecksums: Boolean, contentChecksum: Boolean)

  /** Read an LZ4 frame, verifying HC, block checksums, content size
    * and content checksum when present; throws on anything malformed.
    */
  def decompressFrame(in: Array[Byte]): FrameInfo = {
    var pos = 0
    def u8(): Int = {
      if (pos >= in.length) throw new IllegalStateException("lz4: truncated frame")
      val v = in(pos) & 0xff; pos += 1; v
    }
    def u32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    if (u32() != FrameMagic) throw new IllegalStateException("lz4: bad magic")
    val descStart = pos
    val flg = u8()
    if ((flg >>> 6) != 1) throw new IllegalStateException("lz4: unsupported version")
    val blockChecksum = (flg & 0x10) != 0
    val hasContentSize = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    val hasDictId = (flg & 0x01) != 0
    val bd = u8()
    val bsCode = (bd >>> 4) & 7
    if (bsCode < 4) throw new IllegalStateException("lz4: reserved block size code")
    val maxBlock = 1 << (8 + 2 * bsCode) // 4→64KB … 7→4MB
    var declaredSize = -1L
    if (hasContentSize) {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (u8().toLong) << (8 * i); i += 1 }
      declaredSize = v
    }
    if (hasDictId) u32()
    val descLen = pos - descStart
    val hc = u8()
    if (((xxhash32(in, descStart, descLen, 0) >>> 8) & 0xff) != hc)
      throw new IllegalStateException("lz4: header checksum mismatch")
    val out = new java.io.ByteArrayOutputStream()
    val maxTotal = 1 << 28 // 256 MB in-memory decode bound
    var nBlocks = 0L
    var nStored = 0L
    var endMark = false
    while (!endMark) {
      val word = u32()
      if (word == 0) endMark = true
      else {
        val stored = (word & 0x80000000) != 0
        val size = word & 0x7fffffff
        if (size > maxBlock) throw new IllegalStateException("lz4: block exceeds declared max")
        if (pos + size > in.length) throw new IllegalStateException("lz4: truncated block data")
        val dataOff = pos
        pos += size
        if (blockChecksum) {
          val want = u32()
          if (xxhash32(in, dataOff, size, 0) != want)
            throw new IllegalStateException("lz4: block checksum mismatch")
        }
        if (out.size.toLong + maxBlock > maxTotal)
          throw new IllegalStateException("lz4: output too large")
        if (stored) {
          out.write(in, dataOff, size)
          nStored += 1
        } else {
          // block-independent frames: decompressed size ≤ maxBlock;
          // decode with an elastic bound by retrying is wasteful, so
          // decode into maxBlock and trim to actual output.
          out.write(decompressBlockBounded(in, dataOff, size, maxBlock))
        }
        nBlocks += 1
      }
    }
    val data = out.toByteArray
    if (declaredSize >= 0 && declaredSize != data.length)
      throw new IllegalStateException("lz4: content size mismatch")
    if (contentChecksum) {
      val want = u32()
      if (xxhash32(data, 0, data.length, 0) != want)
        throw new IllegalStateException("lz4: content checksum mismatch")
    }
    FrameInfo(data, nBlocks, nStored, blockChecksum, contentChecksum)
  }

  /** Decode a block whose decompressed size is unknown but bounded. */
  private def decompressBlockBounded(in: Array[Byte], off: Int, len: Int, bound: Int): Array[Byte] = {
    val out = new Array[Byte](bound)
    var pos = off
    val end = off + len
    var op = 0
    def u8(): Int = {
      if (pos >= end) throw new IllegalStateException("lz4: truncated block")
      val v = in(pos) & 0xff; pos += 1; v
    }
    def extLen(nibble: Int): Int = {
      var v = nibble
      if (nibble == 15) {
        var b = 255
        while (b == 255) { b = u8(); v += b }
      }
      v
    }
    var done = false
    while (!done) {
      val token = u8()
      val litLen = extLen(token >>> 4)
      if (pos + litLen > end || op + litLen > bound)
        throw new IllegalStateException("lz4: literal out of range")
      System.arraycopy(in, pos, out, op, litLen)
      pos += litLen; op += litLen
      if (pos == end) done = true
      else {
        val offset = u8() | (u8() << 8)
        if (offset <= 0 || offset > op) throw new IllegalStateException("lz4: bad offset")
        val matchLen = extLen(token & 15) + 4
        if (op + matchLen > bound) throw new IllegalStateException("lz4: match overruns")
        var i = 0
        while (i < matchLen) { out(op + i) = out(op + i - offset); i += 1 }
        op += matchLen
      }
    }
    java.util.Arrays.copyOf(out, op)
  }
}
