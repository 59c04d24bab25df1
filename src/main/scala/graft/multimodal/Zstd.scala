package graft.multimodal

import ZstdEntropy._

/** Zstandard (RFC 8878) in pure JVM — THE compression modern corpus
  * releases and crawl dumps ship in. The DECODER covers the format
  * as real encoders emit it: frame headers (single-segment and
  * windowed, all content-size field widths, checksum flag),
  * skippable frames, concatenated frames, Raw / RLE / Compressed
  * blocks; literals sections Raw / RLE / Huffman-compressed (1- and
  * 4-stream, direct or FSE-compressed weight descriptions) and
  * Treeless (table reuse across blocks); sequences sections with all
  * four symbol-compression modes (Predefined distributions from the
  * RFC, RLE, FSE_Compressed table descriptions, Repeat) and the full
  * execution semantics — literal/match interleave, the three-slot
  * repeat-offset history with the literals-length-0 rotation and the
  * `rep[0]-1` special case — plus the XXH64 content checksum
  * (our own xxHash64 from the published algorithm) VERIFIED. The
  * ENCODER is minimal but genuine: Raw and RLE blocks, and
  * Compressed blocks with raw literals + greedy-matched sequences
  * entropy-coded against the PREDEFINED FSE distributions (backward
  * interleaved-state bitstream exactly as the spec orders it), so
  * reference decoders accept its output. Malformed input throws;
  * callers map to valid=false. ZstdSpec cross-checks zstd-jni in
  * BOTH directions across compression levels (which exercises
  * Huffman literals, FSE-compressed and repeat tables, treeless
  * blocks and repeat offsets corpus-wide) and our xxHash64 against
  * net.jpountz's.
  */
object Zstd {

  final val FrameMagic = 0xfd2fb528
  private final val SkippableMagicMin = 0x184d2a50
  private final val SkippableMagicMax = 0x184d2a5f
  private final val MaxOutput = 1 << 28 // 256 MB sanity bound

  // ---------------------------------------------------------------- xxhash64

  private final val P64_1 = 0x9e3779b185ebca87L
  private final val P64_2 = 0xc2b2ae3d27d4eb4fL
  private final val P64_3 = 0x165667b19e3779f9L
  private final val P64_4 = 0x85ebca77c2b2ae63L
  private final val P64_5 = 0x27d4eb2f165667c5L

  /** xxHash64 from the published spec; wraps mod 2^64. */
  def xxhash64(in: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    import java.lang.Long.rotateLeft
    def lane64(p: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (in(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def lane32(p: Int): Long =
      (in(p) & 0xffL) | ((in(p + 1) & 0xffL) << 8) |
        ((in(p + 2) & 0xffL) << 16) | ((in(p + 3) & 0xffL) << 24)
    def round(acc: Long, lane: Long): Long = rotateLeft(acc + lane * P64_2, 31) * P64_1
    def merge(acc: Long, v: Long): Long = (acc ^ round(0L, v)) * P64_1 + P64_4
    var pos = off
    val end = off + len
    var h =
      if (len >= 32) {
        var a1 = seed + P64_1 + P64_2
        var a2 = seed + P64_2
        var a3 = seed
        var a4 = seed - P64_1
        while (pos + 32 <= end) {
          a1 = round(a1, lane64(pos)); a2 = round(a2, lane64(pos + 8))
          a3 = round(a3, lane64(pos + 16)); a4 = round(a4, lane64(pos + 24))
          pos += 32
        }
        var acc = rotateLeft(a1, 1) + rotateLeft(a2, 7) + rotateLeft(a3, 12) + rotateLeft(a4, 18)
        acc = merge(acc, a1); acc = merge(acc, a2); acc = merge(acc, a3); acc = merge(acc, a4)
        acc
      } else seed + P64_5
    h += len.toLong
    while (pos + 8 <= end) { h = rotateLeft(h ^ round(0L, lane64(pos)), 27) * P64_1 + P64_4; pos += 8 }
    if (pos + 4 <= end) { h = rotateLeft(h ^ (lane32(pos) * P64_1), 23) * P64_2 + P64_3; pos += 4 }
    while (pos < end) { h = rotateLeft(h ^ ((in(pos) & 0xffL) * P64_5), 11) * P64_1; pos += 1 }
    h ^= h >>> 33; h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^= h >>> 32
    h
  }

  // ---------------------------------------------------------------- tables

  // Literals-length codes: baseline + extra bits (RFC 8878 §3.1.1.3.2.1.1)
  private val LlBaseline = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // Match-length codes (RFC §3.1.1.3.2.1.1)
  private val MlBaseline = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // Predefined FSE distributions (RFC §3.1.1.3.2.2)
  private val LlDefaultNorm = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefaultNorm = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefaultNorm = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlDefaultTable = fseBuildDecodeTable(LlDefaultNorm, 6)
  private lazy val MlDefaultTable = fseBuildDecodeTable(MlDefaultNorm, 6)
  private lazy val OfDefaultTable = fseBuildDecodeTable(OfDefaultNorm, 5)

  // ---------------------------------------------------------------- read

  final case class ZstdInfo(data: Array[Byte], nFrames: Long, nBlocks: Long,
                            checksumVerified: Boolean)

  /** Growable frame-output buffer with direct history access (match
    * copies read back into it constantly — a stream abstraction
    * would cost a full copy per sequence).
    */
  private final class Grow(initial: Int) {
    var buf: Array[Byte] = new Array[Byte](math.max(initial, 64))
    var len: Int = 0
    private def ensure(extra: Int): Unit =
      if (len + extra > buf.length) {
        var cap = buf.length * 2
        while (cap < len + extra) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def write(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }
    def writeByte(b: Byte, times: Int): Unit = {
      ensure(times)
      java.util.Arrays.fill(buf, len, len + times, b)
      len += times
    }
    /** Overlap-safe back-reference copy. */
    def copyBack(offset: Int, n: Int): Unit = {
      ensure(n)
      var i = 0
      while (i < n) { buf(len + i) = buf(len + i - offset); i += 1 }
      len += n
    }
  }

  /** Decode a sequence of zstd frames (normal + skippable). Throws on
    * anything malformed, including checksum mismatches.
    */
  def decompress(bytes: Array[Byte]): ZstdInfo = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var nFrames = 0L
    var nBlocks = 0L
    var checksummed = false
    def u32(): Int = {
      require(pos + 4 <= bytes.length, "zstd: truncated")
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    while (pos < bytes.length) {
      val magic = u32()
      if (magic >= SkippableMagicMin && magic <= SkippableMagicMax) {
        val size = u32()
        require(size >= 0 && pos + size <= bytes.length, "zstd: truncated skippable frame")
        pos += size
      } else {
        require(magic == FrameMagic, "zstd: bad magic")
        val (consumed, blocks, cks, frame) = decodeFrame(bytes, pos)
        out.write(frame.buf, 0, frame.len)
        pos += consumed
        nBlocks += blocks
        if (cks) checksummed = true
      }
      nFrames += 1
    }
    ZstdInfo(out.toByteArray, nFrames, nBlocks, checksummed)
  }

  /** One frame after its magic; returns (bytes consumed, block count,
    * had checksum, frame output).
    */
  private def decodeFrame(bytes: Array[Byte], start: Int): (Int, Long, Boolean, Grow) = {
    var pos = start
    def u8(): Int = {
      require(pos < bytes.length, "zstd: truncated frame header")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    val fhd = u8()
    val fcsFlag = fhd >>> 6
    val singleSegment = (fhd & 0x20) != 0
    require((fhd & 0x08) == 0, "zstd: reserved frame header bit set")
    val hasChecksum = (fhd & 0x04) != 0
    val dictIdFlag = fhd & 0x03
    if (!singleSegment) u8() // window descriptor (we decode whole frames in memory)
    val dictBytes = Array(0, 1, 2, 4)(dictIdFlag)
    var dictId = 0L
    var i = 0
    while (i < dictBytes) { dictId |= (u8().toLong) << (8 * i); i += 1 }
    require(dictId == 0L, "zstd: dictionaries not supported")
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    var contentSize = -1L
    if (fcsBytes > 0) {
      var v = 0L
      i = 0
      while (i < fcsBytes) { v |= (u8().toLong) << (8 * i); i += 1 }
      if (fcsBytes == 2) v += 256
      contentSize = v
    }
    val frame = new Grow(
      if (contentSize >= 0L && contentSize <= MaxOutput.toLong) contentSize.toInt else 1024)
    // per-frame entropy carry-over (treeless literals, repeat tables)
    val ctx = new FrameCtx
    var lastBlock = false
    var blocks = 0L
    while (!lastBlock) {
      require(pos + 3 <= bytes.length, "zstd: truncated block header")
      val bh = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) | ((bytes(pos + 2) & 0xff) << 16)
      pos += 3
      lastBlock = (bh & 1) != 0
      val blockType = (bh >> 1) & 3
      val blockSize = bh >>> 3
      require(frame.len.toLong + blockSize <= MaxOutput, "zstd: output too large")
      blockType match {
        case 0 => // Raw
          require(pos + blockSize <= bytes.length, "zstd: truncated raw block")
          frame.write(bytes, pos, blockSize)
          pos += blockSize
        case 1 => // RLE: blockSize is the regenerated size, payload is 1 byte
          require(pos + 1 <= bytes.length, "zstd: truncated rle block")
          frame.writeByte(bytes(pos), blockSize)
          pos += 1
        case 2 =>
          require(pos + blockSize <= bytes.length, "zstd: truncated compressed block")
          decodeCompressedBlock(bytes, pos, blockSize, frame, ctx)
          pos += blockSize
        case _ => throw new IllegalStateException("zstd: reserved block type")
      }
      blocks += 1
    }
    if (contentSize >= 0)
      require(frame.len.toLong == contentSize, "zstd: content size mismatch")
    if (hasChecksum) {
      require(pos + 4 <= bytes.length, "zstd: truncated checksum")
      val stored = (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
        ((bytes(pos + 2) & 0xffL) << 16) | ((bytes(pos + 3) & 0xffL) << 24)
      pos += 4
      val h = xxhash64(frame.buf, 0, frame.len, 0L)
      require((h & 0xffffffffL) == stored, "zstd: content checksum mismatch")
    }
    (pos - start, blocks, hasChecksum, frame)
  }

  /** Entropy state carried across blocks within one frame. */
  private final class FrameCtx {
    var hufTable: HufTable = null
    var llTable: FseTable = null
    var mlTable: FseTable = null
    var ofTable: FseTable = null
    val rep: Array[Int] = Array(1, 4, 8) // persists across blocks within the frame
  }

  private def decodeCompressedBlock(bytes: Array[Byte], off: Int, len: Int,
                                    frame: Grow, ctx: FrameCtx): Unit = {
    val end = off + len
    // ---- literals section
    require(off < end, "zstd: empty compressed block")
    val h0 = bytes(off) & 0xff
    val litType = h0 & 3
    var litPos = off
    var literals: Array[Byte] = null
    litType match {
      case 0 | 1 => // Raw | RLE
        val sizeFormat = (h0 >> 2) & 3
        val (regen, hdr) = sizeFormat match {
          case 0 | 2 => (h0 >>> 3, 1)
          case 1 =>
            require(off + 2 <= end, "zstd: truncated literals header")
            (((h0 >>> 4) | ((bytes(off + 1) & 0xff) << 4)), 2)
          case _ =>
            require(off + 3 <= end, "zstd: truncated literals header")
            ((h0 >>> 4) | ((bytes(off + 1) & 0xff) << 4) | ((bytes(off + 2) & 0xff) << 12), 3)
        }
        require(regen <= MaxOutput, "zstd: literals too large")
        litPos = off + hdr
        if (litType == 0) {
          require(litPos + regen <= end, "zstd: truncated raw literals")
          literals = java.util.Arrays.copyOfRange(bytes, litPos, litPos + regen)
          litPos += regen
        } else {
          require(litPos + 1 <= end, "zstd: truncated rle literals")
          literals = Array.fill(regen)(bytes(litPos))
          litPos += 1
        }
      case _ => // Compressed | Treeless
        val sizeFormat = (h0 >> 2) & 3
        val combined: Long = {
          var v = 0L
          val n = sizeFormat match { case 0 | 1 => 3; case 2 => 4; case _ => 5 }
          require(off + n <= end, "zstd: truncated literals header")
          var i = 0
          while (i < n) { v |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
          litPos = off + n
          v
        }
        val (regen, compSize, nStreams) = sizeFormat match {
          case 0 => (((combined >> 4) & 0x3ff).toInt, ((combined >> 14) & 0x3ff).toInt, 1)
          case 1 => (((combined >> 4) & 0x3ff).toInt, ((combined >> 14) & 0x3ff).toInt, 4)
          case 2 => (((combined >> 4) & 0x3fff).toInt, ((combined >> 18) & 0x3fff).toInt, 4)
          case _ => (((combined >> 4) & 0x3ffff).toInt, ((combined >> 22) & 0x3ffff).toInt, 4)
        }
        require(litPos + compSize <= end, "zstd: truncated compressed literals")
        val streamsEnd = litPos + compSize
        val table =
          if (litType == 2) {
            val (t, consumed) = hufReadTable(bytes, litPos, streamsEnd)
            litPos += consumed
            ctx.hufTable = t
            t
          } else {
            require(ctx.hufTable != null, "zstd: treeless literals with no previous table")
            ctx.hufTable
          }
        literals = new Array[Byte](regen)
        if (nStreams == 1) {
          hufDecodeStream(table, bytes, litPos, streamsEnd - litPos, literals, 0, regen)
        } else {
          require(litPos + 6 <= streamsEnd, "zstd: truncated jump table")
          def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
          val s1 = u16(litPos); val s2 = u16(litPos + 2); val s3 = u16(litPos + 4)
          var p = litPos + 6
          val seg = (regen + 3) / 4
          val sizes = Array(s1, s2, s3, streamsEnd - (p + s1 + s2 + s3))
          require(sizes(3) > 0, "zstd: bad jump table")
          var outOff = 0
          var k = 0
          while (k < 4) {
            val want = if (k < 3) seg else regen - 3 * seg
            require(want >= 0, "zstd: bad 4-stream split")
            hufDecodeStream(table, bytes, p, sizes(k), literals, outOff, want)
            p += sizes(k)
            outOff += want
            k += 1
          }
        }
        litPos = streamsEnd
    }
    // ---- sequences section
    require(litPos < end, "zstd: missing sequences section")
    val b0 = bytes(litPos) & 0xff
    litPos += 1
    var nbSeq = 0
    if (b0 < 128) nbSeq = b0
    else if (b0 < 255) {
      require(litPos < end, "zstd: truncated sequence count")
      nbSeq = ((b0 - 128) << 8) + (bytes(litPos) & 0xff)
      litPos += 1
    } else {
      require(litPos + 2 <= end, "zstd: truncated sequence count")
      nbSeq = (bytes(litPos) & 0xff) + ((bytes(litPos + 1) & 0xff) << 8) + 0x7f00
      litPos += 2
    }
    if (nbSeq == 0) {
      require(litPos == end, "zstd: trailing bytes after empty sequences")
      frame.write(literals, 0, literals.length)
      return
    }
    require(litPos < end, "zstd: missing compression modes")
    val modes = bytes(litPos) & 0xff
    litPos += 1
    require((modes & 3) == 0, "zstd: reserved compression-mode bits")
    def loadTable(mode: Int, default: FseTable, maxAl: Int, maxSym: Int,
                  prev: FseTable): FseTable = mode match {
      case 0 => default
      case 1 => // RLE: one byte, a single-symbol zero-bit table
        require(litPos < end, "zstd: truncated rle table")
        val sym = bytes(litPos) & 0xff
        litPos += 1
        require(sym <= maxSym, "zstd: rle symbol out of range")
        new FseTable(0, Array(sym), Array(0), Array(0))
      case 2 =>
        val (norm, al, consumed) = fseReadTableDescription(bytes, litPos, end, maxAl, maxSym)
        litPos += consumed
        require(norm.length - 1 <= maxSym, "zstd: FSE symbol out of range")
        fseBuildDecodeTable(norm, al)
      case _ =>
        require(prev != null, "zstd: repeat mode with no previous table")
        prev
    }
    val llT = loadTable((modes >> 6) & 3, LlDefaultTable, 9, 35, ctx.llTable)
    val ofT = loadTable((modes >> 4) & 3, OfDefaultTable, 8, 31, ctx.ofTable)
    val mlT = loadTable((modes >> 2) & 3, MlDefaultTable, 9, 52, ctx.mlTable)
    ctx.llTable = llT; ctx.ofTable = ofT; ctx.mlTable = mlT
    // ---- decode + execute sequences
    val bits = new BackwardBits(bytes, litPos, end - litPos)
    var llState = bits.read(llT.accuracyLog)
    var ofState = bits.read(ofT.accuracyLog)
    var mlState = bits.read(mlT.accuracyLog)
    val rep = ctx.rep
    var litConsumed = 0
    var s = 0
    while (s < nbSeq) {
      val ofCode = ofT.symbol(ofState)
      require(ofCode <= 31, "zstd: offset code out of range")
      val offsetValue = (1L << ofCode) + bits.readLong(ofCode)
      val mlCode = mlT.symbol(mlState)
      val matchLen = MlBaseline(mlCode) + bits.read(MlBits(mlCode))
      val llCode = llT.symbol(llState)
      val litLen = LlBaseline(llCode) + bits.read(LlBits(llCode))
      // repeat-offset resolution
      val offset: Int =
        if (offsetValue > 3) {
          val o = (offsetValue - 3).toLong
          require(o <= Int.MaxValue, "zstd: offset too large")
          rep(2) = rep(1); rep(1) = rep(0); rep(0) = o.toInt
          o.toInt
        } else {
          val idx = offsetValue.toInt
          val o =
            if (litLen != 0) {
              idx match {
                case 1 => rep(0)
                case 2 => { val t = rep(1); rep(1) = rep(0); rep(0) = t; t }
                case _ => { val t = rep(2); rep(2) = rep(1); rep(1) = rep(0); rep(0) = t; t }
              }
            } else {
              idx match {
                case 1 => { val t = rep(1); rep(1) = rep(0); rep(0) = t; t }
                case 2 => { val t = rep(2); rep(2) = rep(1); rep(1) = rep(0); rep(0) = t; t }
                case _ =>
                  val t = rep(0) - 1
                  require(t > 0, "zstd: repeat offset underflow")
                  rep(2) = rep(1); rep(1) = rep(0); rep(0) = t
                  t
              }
            }
          require(o > 0, "zstd: zero offset")
          o
        }
      require(litConsumed + litLen <= literals.length, "zstd: literals overrun")
      frame.write(literals, litConsumed, litLen)
      litConsumed += litLen
      // match copy (may overlap its own output)
      require(offset <= frame.len, "zstd: offset beyond frame start")
      require(frame.len.toLong + matchLen <= MaxOutput, "zstd: output too large")
      frame.copyBack(offset, matchLen)
      if (s != nbSeq - 1) {
        llState = llT.baseline(llState) + bits.read(llT.nbBits(llState))
        mlState = mlT.baseline(mlState) + bits.read(mlT.nbBits(mlState))
        ofState = ofT.baseline(ofState) + bits.read(ofT.nbBits(ofState))
      }
      s += 1
    }
    require(bits.exhausted, "zstd: sequence bitstream not fully consumed")
    frame.write(literals, litConsumed, literals.length - litConsumed)
  }

  // ---------------------------------------------------------------- write

  /** Encode one frame: single-segment header with content size and
    * checksum, blocks of `blockSize` input bytes choosing RLE /
    * Compressed (raw literals + predefined-FSE sequences) / Raw per
    * chunk, whichever is smallest.
    */
  def compress(in: Array[Byte], blockSize: Int = 1 << 15): Array[Byte] = {
    require(blockSize >= 1 && blockSize <= (1 << 17), "blockSize must be in [1, 128K]")
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 64)
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    u32(FrameMagic)
    // single segment + checksum; FCS field width by content size
    val fcsFlag = if (in.length < 256) 0 else if (in.length < 65536 + 256) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04)
    fcsFlag match {
      case 0 => out.write(in.length)
      case 1 =>
        val v = in.length - 256
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      case _ => u32(in.length)
    }
    if (in.length == 0) {
      out.write(1); out.write(0); out.write(0) // last, Raw, size 0
    } else {
      var pos = 0
      while (pos < in.length) {
        val n = math.min(blockSize, in.length - pos)
        val last = pos + n == in.length
        val chunk = java.util.Arrays.copyOfRange(in, pos, pos + n)
        val body = encodeBlockBody(chunk)
        def header(tpe: Int, size: Int): Unit = {
          val bh = (if (last) 1 else 0) | (tpe << 1) | (size << 3)
          out.write(bh & 0xff); out.write((bh >> 8) & 0xff); out.write((bh >> 16) & 0xff)
        }
        if (chunk.forall(_ == chunk(0))) {
          header(1, n) // RLE: size = regenerated
          out.write(chunk(0))
        } else if (body != null && body.length < n) {
          header(2, body.length)
          out.write(body)
        } else {
          header(0, n)
          out.write(chunk)
        }
        pos += n
      }
    }
    val h = xxhash64(in, 0, in.length, 0L)
    u32((h & 0xffffffffL).toInt)
    out.toByteArray
  }

  /** Compressed-block body: raw literals + greedy matches coded with
    * the predefined FSE distributions; null when no matches exist.
    */
  private def encodeBlockBody(chunk: Array[Byte]): Array[Byte] = {
    // greedy matcher (same family as Snappy/Lz4): sequences of
    // (litLen, matchLen >= 3 via >= 4 finds, offset)
    final case class Seq3(litLen: Int, matchLen: Int, offset: Int)
    val seqs = Vector.newBuilder[Seq3]
    val lits = new java.io.ByteArrayOutputStream()
    val hashBits = 14
    val table = new Array[Int](1 << hashBits)
    def hash4(p: Int): Int = {
      val v = (chunk(p) & 0xff) | ((chunk(p + 1) & 0xff) << 8) |
        ((chunk(p + 2) & 0xff) << 16) | ((chunk(p + 3) & 0xff) << 24)
      (v * 0x1e35a7bd) >>> (32 - hashBits)
    }
    var litStart = 0
    var pos = 0
    var n = 0
    while (pos + 4 <= chunk.length) {
      val h = hash4(pos)
      val cand = table(h) - 1
      table(h) = pos + 1
      if (cand >= 0 &&
        chunk(cand) == chunk(pos) && chunk(cand + 1) == chunk(pos + 1) &&
        chunk(cand + 2) == chunk(pos + 2) && chunk(cand + 3) == chunk(pos + 3)) {
        var m = 4
        while (pos + m < chunk.length && chunk(cand + m) == chunk(pos + m) && m < 0xffff) m += 1
        lits.write(chunk, litStart, pos - litStart)
        seqs += Seq3(pos - litStart, m, pos - cand)
        n += 1
        pos += m
        litStart = pos
      } else pos += 1
    }
    if (n == 0) return null
    lits.write(chunk, litStart, chunk.length - litStart)
    val literals = lits.toByteArray
    val sv = seqs.result()

    val body = new java.io.ByteArrayOutputStream()
    // raw literals section, size format 11 (20-bit size, 3 bytes)
    val lh = (0) | (3 << 2) | (literals.length << 4)
    body.write(lh & 0xff); body.write((lh >> 8) & 0xff); body.write((lh >> 16) & 0xff)
    body.write(literals)
    // sequence count (all three width forms, by value)
    if (n < 128) body.write(n)
    else if (n < 0x7f00) { body.write(128 + (n >> 8)); body.write(n & 0xff) }
    else { body.write(255); body.write((n - 0x7f00) & 0xff); body.write(((n - 0x7f00) >> 8) & 0xff) }
    body.write(0) // all three modes Predefined
    // codes per sequence
    def llCode(v: Int): Int = {
      if (v < 16) v
      else {
        var c = 35
        while (LlBaseline(c) > v) c -= 1
        c
      }
    }
    def mlCode(v: Int): Int = {
      if (v - 3 < 32) v - 3
      else {
        var c = 52
        while (MlBaseline(c) > v) c -= 1
        c
      }
    }
    val llE = new FseEncoder(LlDefaultNorm, 6)
    val ofE = new FseEncoder(OfDefaultNorm, 5)
    val mlE = new FseEncoder(MlDefaultNorm, 6)
    val w = new BackwardBitsWriter
    val lastI = n - 1
    def codesOf(q: Seq3): (Int, Int, Int) = {
      val offsetValue = q.offset.toLong + 3
      val oc = 63 - java.lang.Long.numberOfLeadingZeros(offsetValue)
      (llCode(q.litLen), oc.toInt, mlCode(q.matchLen))
    }
    val (llL, ofL, mlL) = codesOf(sv(lastI))
    mlE.init(mlL); ofE.init(ofL); llE.init(llL)
    def addExtras(q: Seq3, ll: Int, of: Int, ml: Int): Unit = {
      w.add((q.litLen - LlBaseline(ll)).toLong, LlBits(ll))
      w.add((q.matchLen - MlBaseline(ml)).toLong, MlBits(ml))
      w.add((q.offset.toLong + 3) - (1L << of), of)
    }
    addExtras(sv(lastI), llL, ofL, mlL)
    var i = lastI - 1
    while (i >= 0) {
      val (ll, of, ml) = codesOf(sv(i))
      ofE.encode(w, of)
      mlE.encode(w, ml)
      llE.encode(w, ll)
      addExtras(sv(i), ll, of, ml)
      i -= 1
    }
    mlE.flush(w); ofE.flush(w); llE.flush(w)
    body.write(w.finish())
    body.toByteArray
  }
}
