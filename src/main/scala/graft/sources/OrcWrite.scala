package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Native ORC writer — the inverse of [[OrcRead]], assembling an ORC
  * v1 file byte-by-byte from the public spec: "ORC" header magic, one
  * stripe of data streams (RLEv2 DIRECT integers with zigzag +
  * closest-fixed-bits widths, IEEE little-endian doubles, DIRECT_V2
  * strings as data blob + RLEv2 lengths), a protobuf stripe footer
  * (stream directory + column encodings), the file footer (type tree,
  * stripe directory, per-column statistics, row count), and the
  * postscript — everything except the postscript riding the ZLIB
  * chunk framing (3-byte little-endian headers, raw-DEFLATE chunks
  * through the JDK Deflater, stored chunks when deflate doesn't
  * help). Completes the columnar-format pair: the engine now reads
  * AND writes both parquet (q143/q144/q145) and ORC (q149/q150/q151)
  * from their public specifications.
  *
  * Scope: flat schemas of non-null LONG / DOUBLE / STRING columns,
  * one stripe, no row index (rowIndexStride 0) — the shape one output
  * task of a partitioned write produces; orc-core (Spark's reader)
  * consuming the bytes is the correctness witness (OrcWriteSpec), and
  * our own OrcRead round-trips them.
  */
object OrcWrite {

  sealed trait ColSpec { def name: String }
  final case class LongCol(name: String, values: Array[Long]) extends ColSpec
  final case class DoubleCol(name: String, values: Array[Double]) extends ColSpec
  final case class StringCol(name: String, values: Array[String]) extends ColSpec

  // ------------------------------------------------------ protobuf-lite
  private final class Pw {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { tag(field, 0); varint((v << 1) ^ (v >> 63)) }
    def fixed64(field: Int, bits: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes(UTF_8))
    def message(field: Int)(body: Pw => Unit): Unit = {
      val child = new Pw; body(child); bytes(field, child.result)
    }
    def result: Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------- bit packer
  private final class BitWriter(out: ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
  }

  private def closestFixedBits(n: Int): Int =
    if (n <= 24) math.max(n, 1)
    else if (n <= 26) 26 else if (n <= 28) 28 else if (n <= 30) 30
    else if (n <= 32) 32 else if (n <= 40) 40 else if (n <= 48) 48
    else if (n <= 56) 56 else 64

  private def encodeBitWidth(w: Int): Int =
    if (w <= 24) w - 1
    else w match {
      case 26 => 24; case 28 => 25; case 30 => 26; case 32 => 27
      case 40 => 28; case 48 => 29; case 56 => 30; case 64 => 31
      case other => throw new IllegalStateException(s"orc: width $other not encodable")
    }

  /** RLEv2 DIRECT runs of ≤512 (zigzag when signed) — a valid
    * encoding for any integer sequence; the writer doesn't need the
    * fancier forms to be spec-conformant.
    */
  private[sources] def encodeRleV2(values: Array[Long], signed: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < values.length) {
      val len = math.min(512, values.length - i)
      var maxBits = 1
      var j = 0
      while (j < len) {
        val raw = values(i + j)
        val enc = if (signed) (raw << 1) ^ (raw >> 63) else raw
        val bits = 64 - java.lang.Long.numberOfLeadingZeros(enc)
        if (bits > maxBits) maxBits = bits
        j += 1
      }
      val width = closestFixedBits(maxBits)
      val code = encodeBitWidth(width)
      out.write(0x40 | (code << 1) | ((len - 1) >>> 8))
      out.write((len - 1) & 0xff)
      val bw = new BitWriter(out)
      j = 0
      while (j < len) {
        val raw = values(i + j)
        val enc = if (signed) (raw << 1) ^ (raw >> 63) else raw
        bw.writeBits(enc, width)
        j += 1
      }
      bw.align()
      i += len
    }
    out.toByteArray
  }

  // ------------------------------------------------------ chunk framing
  /** ORC compression framing: ZLIB (raw DEFLATE) chunks under 3-byte
    * little-endian (len << 1 | isOriginal) headers; stored when
    * deflate does not shrink the chunk.
    */
  private def chunked(plain: Array[Byte], blockSize: Int): Array[Byte] = {
    if (plain.isEmpty) return Array.emptyByteArray
    val out = new ByteArrayOutputStream(plain.length / 2 + 64)
    var off = 0
    while (off < plain.length) {
      val len = math.min(blockSize, plain.length - off)
      val deflated = deflateRaw(plain, off, len)
      val (payload, original) =
        if (deflated.length < len) (deflated, false)
        else (java.util.Arrays.copyOfRange(plain, off, off + len), true)
      val h = (payload.length << 1) | (if (original) 1 else 0)
      out.write(h & 0xff); out.write((h >>> 8) & 0xff); out.write((h >>> 16) & 0xff)
      out.write(payload, 0, payload.length)
      off += len
    }
    out.toByteArray
  }

  private def deflateRaw(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(b, off, len)
      d.finish()
      val out = new ByteArrayOutputStream(len / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally d.end()
  }

  // ------------------------------------------------------------- writer
  private val BlockSize = 64 * 1024

  def write(cols: Seq[ColSpec]): Array[Byte] = {
    require(cols.nonEmpty, "orc: no columns")
    val nRows = cols.head match {
      case LongCol(_, v) => v.length
      case DoubleCol(_, v) => v.length
      case StringCol(_, v) => v.length
    }
    cols.foreach {
      case LongCol(n, v) => require(v.length == nRows, s"orc: ragged column $n")
      case DoubleCol(n, v) => require(v.length == nRows, s"orc: ragged column $n")
      case StringCol(n, v) =>
        require(v.length == nRows, s"orc: ragged column $n")
        require(!v.contains(null), s"orc: null in $n (non-null writer)")
    }

    val file = new ByteArrayOutputStream()
    file.write('O'); file.write('R'); file.write('C')

    // ---- data streams (column ids: 0 root struct, 1..n leaves)
    // each entry: (streamKind, columnId, framedBytes)
    val streams = Seq.newBuilder[(Int, Int, Array[Byte])]
    cols.zipWithIndex.foreach { case (c, i) =>
      val colId = i + 1
      c match {
        case LongCol(_, v) =>
          streams += ((1, colId, chunked(encodeRleV2(v, signed = true), BlockSize)))
        case DoubleCol(_, v) =>
          val raw = new Array[Byte](8 * v.length)
          var j = 0
          while (j < v.length) {
            val bits = java.lang.Double.doubleToLongBits(v(j))
            var k = 0
            while (k < 8) { raw(8 * j + k) = ((bits >>> (8 * k)) & 0xff).toByte; k += 1 }
            j += 1
          }
          streams += ((1, colId, chunked(raw, BlockSize)))
        case StringCol(_, v) =>
          val blob = new ByteArrayOutputStream()
          v.foreach(s => { val b = s.getBytes(UTF_8); blob.write(b, 0, b.length) })
          streams += ((1, colId, chunked(blob.toByteArray, BlockSize)))
          streams += ((2, colId, chunked(
            encodeRleV2(v.map(_.getBytes(UTF_8).length.toLong), signed = false), BlockSize)))
      }
    }
    val streamList = streams.result()

    val stripeOffset = file.size().toLong
    streamList.foreach { case (_, _, b) => file.write(b, 0, b.length) }
    val dataLength = file.size() - stripeOffset

    // ---- stripe footer
    val stripeFooterPlain = {
      val p = new Pw
      streamList.foreach { case (kind, colId, b) =>
        p.message(1) { s => s.int(1, kind.toLong); s.int(2, colId.toLong); s.int(3, b.length.toLong) }
      }
      // column encodings: root struct DIRECT, longs/strings DIRECT_V2, doubles DIRECT
      p.message(2)(e => e.int(1, 0L))
      cols.foreach {
        case _: LongCol => p.message(2)(e => e.int(1, 2L))
        case _: DoubleCol => p.message(2)(e => e.int(1, 0L))
        case _: StringCol => p.message(2)(e => e.int(1, 2L))
      }
      p.result
    }
    val stripeFooter = chunked(stripeFooterPlain, BlockSize)
    file.write(stripeFooter, 0, stripeFooter.length)

    // ---- file footer
    val footerPlain = {
      val p = new Pw
      p.int(1, 3L) // headerLength ("ORC")
      p.int(2, stripeOffset + dataLength + stripeFooter.length) // contentLength
      p.message(3) { s => // the single stripe
        s.int(1, stripeOffset); s.int(2, 0L); s.int(3, dataLength)
        s.int(4, stripeFooter.length.toLong); s.int(5, nRows.toLong)
      }
      p.message(4) { t => // root struct
        t.int(1, 12L)
        cols.zipWithIndex.foreach { case (_, i) => t.int(2, (i + 1).toLong) }
        cols.foreach(c => t.str(3, c.name))
      }
      cols.foreach { c =>
        p.message(4) { t =>
          t.int(1, c match {
            case _: LongCol => 4L
            case _: DoubleCol => 6L
            case _: StringCol => 7L
          })
        }
      }
      p.int(6, nRows.toLong) // numberOfRows
      // statistics: root, then per column
      p.message(7) { s => s.int(1, nRows.toLong); s.int(10, 0L) }
      cols.foreach { c =>
        p.message(7) { s =>
          s.int(1, nRows.toLong)
          c match {
            case LongCol(_, v) if v.nonEmpty => s.message(2) { i =>
              i.sint(1, v.min); i.sint(2, v.max); i.sint(3, v.sum)
            }
            case DoubleCol(_, v) if v.nonEmpty => s.message(3) { d =>
              d.fixed64(1, java.lang.Double.doubleToLongBits(v.min))
              d.fixed64(2, java.lang.Double.doubleToLongBits(v.max))
            }
            case StringCol(_, v) if v.nonEmpty => s.message(4) { t =>
              t.str(1, v.min); t.str(2, v.max)
            }
            case _ => ()
          }
          s.int(10, 0L) // hasNull = false
        }
      }
      p.int(8, 0L) // rowIndexStride: no row index
      p.result
    }
    val footer = chunked(footerPlain, BlockSize)
    file.write(footer, 0, footer.length)

    // ---- postscript (never compressed)
    val ps = {
      val p = new Pw
      p.int(1, footer.length.toLong) // footerLength
      p.int(2, 1L) // compression: ZLIB
      p.int(3, BlockSize.toLong)
      p.int(4, 0L); p.int(4, 12L) // file version 0.12 (repeated uint32)
      p.int(5, 0L) // metadataLength (no metadata section)
      p.int(6, 9L) // writerVersion: modern (post-ORC-517) semantics
      p.str(8000, "ORC")
      p.result
    }
    require(ps.length < 256, "orc: postscript too long")
    file.write(ps, 0, ps.length)
    file.write(ps.length)
    file.toByteArray
  }
}
