package graft.sources

import graft.util.FlatBuf
import scala.collection.mutable.ArrayBuffer

/** Apache Arrow IPC FILE format reader + writer (the published
  * columnar spec: arrow.apache.org/docs/format/Columnar.html — magic
  * "ARROW1", encapsulated flatbuffer messages, a footer with block
  * locations) — THE interchange format of ML data tooling: feature
  * stores, dataframe libraries and GPU loaders hand corpora around
  * as Arrow files, so a 100 TB ingest tier must read them natively,
  * the way q136/q137/q143 read Avro/TFRecord/Parquet. Both
  * directions are hand-rolled on graft's own minimal flatbuffers
  * layer ([[graft.util.FlatBuf]]); the spec cross-checks BOTH against
  * the real Arrow Java library on the Spark classpath (our writer →
  * `ArrowFileReader`, `ArrowFileWriter` → our reader — the JPEG/
  * ImageIO two-implementation pattern), and the oracle replays the
  * writer's closed-form synthesis.
  *
  * Scope (the ingest-metadata tier): Int 32/64-bit signed, Float64,
  * Utf8 columns, nullable with validity bitmaps (including the
  * null_count = 0 / empty-validity-buffer arm), multiple record
  * batches, little-endian, no compression, no dictionaries, no
  * nested types — files outside this scope decode as invalid, never
  * throw.
  */
object ArrowIpc {

  // ---- schema model ----

  sealed trait ColType
  case object I64 extends ColType
  case object I32 extends ColType
  case object F64 extends ColType
  case object Str extends ColType

  final case class Col(name: String, tpe: ColType, nullable: Boolean)

  /** One decoded batch: `cols(i)(row)` — None = null. Values are
    * Long (I32/I64), Double (F64) or String (Str).
    */
  final case class Batch(nRows: Int, cols: Seq[IndexedSeq[Option[Any]]])

  final case class ArrowFile(schema: Seq[Col], batches: Seq[Batch]) {
    def nRows: Long = batches.map(_.nRows.toLong).sum
  }

  // ---- flatbuffers enum constants (Schema.fbs / Message.fbs) ----

  private val V5 = 4 // MetadataVersion.V5
  private val HeaderSchema = 1
  private val HeaderRecordBatch = 3
  private val TypeInt = 2
  private val TypeFloatingPoint = 3
  private val TypeUtf8 = 5
  private val PrecisionDouble = 2

  private val MagicFile = "ARROW1".getBytes("US-ASCII")

  // =================================================================
  // writer
  // =================================================================

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** Field + type tables for one column; returns the Field offset. */
  private def fieldTable(b: FlatBuf.Builder, c: Col): Int = {
    val nameOff = b.createString(c.name)
    val (typeType, typeOff) = c.tpe match {
      case I64 =>
        b.startTable(2)
        b.addFieldInt(0, 64, 0)
        b.addFieldBool(1, v = true, default = false)
        (TypeInt, b.endTable())
      case I32 =>
        b.startTable(2)
        b.addFieldInt(0, 32, 0)
        b.addFieldBool(1, v = true, default = false)
        (TypeInt, b.endTable())
      case F64 =>
        b.startTable(1)
        b.addFieldShort(0, PrecisionDouble.toShort, 0)
        (TypeFloatingPoint, b.endTable())
      case Str =>
        b.startTable(0)
        (TypeUtf8, b.endTable())
    }
    b.startTable(7)
    b.addFieldOffset(0, nameOff)
    b.addFieldBool(1, c.nullable, default = false)
    b.addFieldByte(2, typeType.toByte, 0)
    b.addFieldOffset(3, typeOff)
    b.endTable()
  }

  private def schemaTable(b: FlatBuf.Builder, schema: Seq[Col]): Int = {
    val fields = schema.map(c => fieldTable(b, c))
    b.startVector(4, fields.size, 4)
    fields.reverse.foreach(b.addOffset)
    val vec = b.endVector(fields.size)
    b.startTable(4)
    b.addFieldOffset(1, vec) // endianness(0) = Little = default 0
    b.endTable()
  }

  /** Encapsulated message: continuation marker, padded size prefix,
    * flatbuffer. Returns (bytes, paddedMetaLen).
    */
  private def message(headerType: Int, bodyLength: Long)
                     (buildHeader: FlatBuf.Builder => Int): Array[Byte] = {
    val b = new FlatBuf.Builder()
    val h = buildHeader(b)
    b.startTable(5)
    b.addFieldShort(0, V5.toShort, 0)
    b.addFieldByte(1, headerType.toByte, 0)
    b.addFieldOffset(2, h)
    b.addFieldLong(3, bodyLength, 0L)
    val fb = b.finish(b.endTable())
    val padded = pad8(fb.length) // finish() already 8-aligns, kept for clarity
    val out = new Array[Byte](8 + padded)
    out(0) = -1; out(1) = -1; out(2) = -1; out(3) = -1 // 0xFFFFFFFF continuation
    out(4) = (padded & 0xff).toByte
    out(5) = ((padded >> 8) & 0xff).toByte
    out(6) = ((padded >> 16) & 0xff).toByte
    out(7) = ((padded >>> 24) & 0xff).toByte
    System.arraycopy(fb, 0, out, 8, fb.length)
    out
  }

  /** Serialize one batch's body buffers + their (offset, length)
    * table and field nodes, in spec order: per column validity then
    * data (Utf8: validity, offsets, data). A column with no nulls in
    * the batch exercises the EMPTY validity buffer arm.
    */
  private def batchBody(schema: Seq[Col], cols: Seq[IndexedSeq[Option[Any]]])
      : (Array[Byte], Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val body = ArrayBuffer.empty[Byte]
    val buffers = ArrayBuffer.empty[(Long, Long)]
    val nodes = ArrayBuffer.empty[(Long, Long)]
    def append(bytes: Array[Byte]): Unit = {
      buffers += ((body.length.toLong, bytes.length.toLong))
      body ++= bytes
      var p = body.length
      while ((p & 7) != 0) { body += 0; p += 1 }
    }
    schema.zip(cols).foreach { case (c, col) =>
      val n = col.size
      val nulls = col.count(_.isEmpty)
      nodes += ((n.toLong, nulls.toLong))
      if (nulls == 0) append(Array.emptyByteArray)
      else {
        val bm = new Array[Byte]((n + 7) / 8)
        var i = 0
        while (i < n) {
          if (col(i).isDefined) bm(i / 8) = (bm(i / 8) | (1 << (i % 8))).toByte
          i += 1
        }
        append(bm)
      }
      c.tpe match {
        case I64 | I32 =>
          val w = if (c.tpe == I64) 8 else 4
          val data = new Array[Byte](n * w)
          var i = 0
          while (i < n) {
            val v = col(i).map(_.asInstanceOf[Long]).getOrElse(0L)
            var j = 0
            while (j < w) { data(i * w + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
            i += 1
          }
          append(data)
        case F64 =>
          val data = new Array[Byte](n * 8)
          var i = 0
          while (i < n) {
            val v = java.lang.Double.doubleToLongBits(
              col(i).map(_.asInstanceOf[Double]).getOrElse(0.0))
            var j = 0
            while (j < 8) { data(i * 8 + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
            i += 1
          }
          append(data)
        case Str =>
          val utf8 = col.map(_.map(_.asInstanceOf[String].getBytes("UTF-8"))
            .getOrElse(Array.emptyByteArray))
          val offs = new Array[Byte]((n + 1) * 4)
          var acc = 0
          var i = 0
          while (i <= n) {
            offs(i * 4) = (acc & 0xff).toByte
            offs(i * 4 + 1) = ((acc >> 8) & 0xff).toByte
            offs(i * 4 + 2) = ((acc >> 16) & 0xff).toByte
            offs(i * 4 + 3) = ((acc >>> 24) & 0xff).toByte
            if (i < n) acc += utf8(i).length
            i += 1
          }
          append(offs)
          val data = new Array[Byte](acc)
          var pos = 0
          utf8.foreach { u => System.arraycopy(u, 0, data, pos, u.length); pos += u.length }
          append(data)
      }
    }
    (body.toArray, nodes.toSeq, buffers.toSeq)
  }

  /** Write a complete Arrow IPC file. `batches(b)(c)(row)`. */
  def encode(schema: Seq[Col], batches: Seq[Seq[IndexedSeq[Option[Any]]]]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out ++= MagicFile
    out += 0; out += 0 // pad to 8
    out ++= message(HeaderSchema, 0L)(b => schemaTable(b, schema))
    val blocks = ArrayBuffer.empty[(Long, Int, Long)] // (offset, metaLen incl prefix, bodyLen)
    batches.foreach { cols =>
      require(cols.size == schema.size, "column count mismatch")
      val n = if (cols.isEmpty) 0 else cols.head.size
      require(cols.forall(_.size == n), "ragged batch")
      val (body, nodes, buffers) = batchBody(schema, cols)
      val msg = message(HeaderRecordBatch, body.length.toLong) { b =>
        b.startVector(16, buffers.size, 8)
        buffers.reverse.foreach { case (off, len) => b.addLong(len); b.addLong(off) }
        val bufVec = b.endVector(buffers.size)
        b.startVector(16, nodes.size, 8)
        nodes.reverse.foreach { case (len, nc) => b.addLong(nc); b.addLong(len) }
        val nodeVec = b.endVector(nodes.size)
        b.startTable(5)
        b.addFieldLong(0, n.toLong, 0L)
        b.addFieldOffset(1, nodeVec)
        b.addFieldOffset(2, bufVec)
        b.endTable()
      }
      blocks += ((out.length.toLong, msg.length, body.length.toLong))
      out ++= msg
      out ++= body
    }
    // end-of-stream marker
    out += -1; out += -1; out += -1; out += -1
    out += 0; out += 0; out += 0; out += 0
    // footer flatbuffer
    val fb = new FlatBuf.Builder()
    val fSchema = schemaTable(fb, schema)
    fb.startVector(24, blocks.size, 8)
    blocks.reverse.foreach { case (off, metaLen, bodyLen) =>
      fb.addLong(bodyLen)
      fb.addInt(0) // struct padding
      fb.addInt(metaLen)
      fb.addLong(off)
    }
    val blockVec = fb.endVector(blocks.size)
    fb.startVector(24, 0, 8)
    val dictVec = fb.endVector(0)
    fb.startTable(5)
    fb.addFieldShort(0, V5.toShort, 0)
    fb.addFieldOffset(1, fSchema)
    fb.addFieldOffset(2, dictVec)
    fb.addFieldOffset(3, blockVec)
    val footer = fb.finish(fb.endTable())
    out ++= footer
    val fl = footer.length
    out += (fl & 0xff).toByte; out += ((fl >> 8) & 0xff).toByte
    out += ((fl >> 16) & 0xff).toByte; out += ((fl >>> 24) & 0xff).toByte
    out ++= MagicFile
    out.toArray
  }

  // =================================================================
  // reader
  // =================================================================

  private def parseSchema(r: FlatBuf.Reader, schemaT: Int): Option[Seq[Col]] = {
    if (schemaT == 0) return None
    val fieldsVec = r.fieldRef(schemaT, 1)
    if (fieldsVec == 0) return None
    val n = r.vecLen(fieldsVec)
    val cols = (0 until n).map { i =>
      val f = r.indirect(r.vecElems(fieldsVec) + i * 4)
      val nameOff = r.fieldRef(f, 0)
      if (nameOff == 0) return None
      val name = r.string(nameOff)
      val nullable = r.fieldBool(f, 1, default = false)
      val children = r.fieldRef(f, 5)
      if (children != 0 && r.vecLen(children) > 0) return None // nested: out of scope
      if (r.fieldRef(f, 4) != 0) return None // dictionary-encoded: out of scope
      val tt = r.fieldU8(f, 2, 0)
      val tOff = r.fieldRef(f, 3)
      val tpe: ColType = tt match {
        case TypeInt =>
          val bw = r.fieldI32(tOff, 0, 0)
          val signed = r.fieldBool(tOff, 1, default = false)
          if (!signed) return None
          bw match { case 64 => I64; case 32 => I32; case _ => return None }
        case TypeFloatingPoint =>
          if (r.fieldI16(tOff, 0, 0) != PrecisionDouble) return None
          F64
        case TypeUtf8 => Str
        case _ => return None
      }
      Col(name, tpe, nullable)
    }
    Some(cols)
  }

  /** Decode a complete Arrow IPC file; None on anything outside the
    * supported scope or structurally broken (never throws).
    */
  def decode(bytes: Array[Byte]): Option[ArrowFile] =
    try decodeUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) |
                 (_: ArrayIndexOutOfBoundsException) => None }

  private def rdI32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) |
      ((b(p + 3) & 0xff) << 24)

  private def decodeUnsafe(bytes: Array[Byte]): Option[ArrowFile] = {
    if (bytes.length < 8 + 10) return None
    if (!MagicFile.indices.forall(i => bytes(i) == MagicFile(i))) return None
    if (!MagicFile.indices.forall(i =>
      bytes(bytes.length - 6 + i) == MagicFile(i))) return None
    val footerLen = rdI32(bytes, bytes.length - 10)
    val footerStart = bytes.length - 10 - footerLen
    if (footerLen <= 0 || footerStart < 8) return None
    val r = new FlatBuf.Reader(bytes, footerStart, bytes.length - 10)
    val footer = r.root
    val dicts = r.fieldRef(footer, 2)
    if (dicts != 0 && r.vecLen(dicts) > 0) return None // dictionaries: out of scope
    val schema = parseSchema(r, r.fieldRef(footer, 1)).getOrElse(return None)
    val blocksVec = r.fieldRef(footer, 3)
    val nBlocks = if (blocksVec == 0) 0 else r.vecLen(blocksVec)
    val batches = (0 until nBlocks).map { bi =>
      val bp = r.vecElems(blocksVec) + bi * 24
      val off = r.i64(bp)
      if (off < 8 || off > bytes.length - 8 || (off & 7) != 0) return None
      val o = off.toInt
      if (rdI32(bytes, o) != -1) return None // continuation marker
      val metaLen = rdI32(bytes, o + 4)
      if (metaLen <= 0 || o + 8 + metaLen > bytes.length) return None
      val mr = new FlatBuf.Reader(bytes, o + 8, o + 8 + metaLen)
      val msg = mr.root
      if (mr.fieldU8(msg, 1, 0) != HeaderRecordBatch) return None
      val rb = mr.fieldRef(msg, 2)
      if (rb == 0) return None
      if (mr.fieldRef(rb, 3) != 0) return None // compression: out of scope
      val bodyLen = mr.fieldI64(msg, 3, 0L)
      val bodyStart = o + 8 + metaLen
      if (bodyStart + bodyLen > bytes.length) return None
      val nRowsL = mr.fieldI64(rb, 0, 0L)
      if (nRowsL < 0 || nRowsL > Int.MaxValue) return None
      val nRows = nRowsL.toInt
      val nodesVec = mr.fieldRef(rb, 1)
      val bufsVec = mr.fieldRef(rb, 2)
      if (nodesVec == 0 || bufsVec == 0) return None
      if (mr.vecLen(nodesVec) != schema.size) return None
      val nBufs = mr.vecLen(bufsVec)
      var bufIdx = 0
      def nextBuf(): (Long, Long) = {
        if (bufIdx >= nBufs) throw new ArrayIndexOutOfBoundsException(bufIdx)
        val p = mr.vecElems(bufsVec) + bufIdx * 16
        bufIdx += 1
        (mr.i64(p), mr.i64(p + 8))
      }
      val cols = schema.zipWithIndex.map { case (c, ci) =>
        val np = mr.vecElems(nodesVec) + ci * 16
        val nodeLen = mr.i64(np)
        if (nodeLen != nRows) return None
        val (vOff, vLen) = nextBuf()
        def isValid(i: Int): Boolean =
          vLen == 0 ||
            ((bytes(bodyStart + vOff.toInt + i / 8) >> (i % 8)) & 1) == 1
        c.tpe match {
          case I64 | I32 =>
            val w = if (c.tpe == I64) 8 else 4
            val (dOff, dLen) = nextBuf()
            if (dLen < nRows.toLong * w) return None
            val base = bodyStart + dOff.toInt
            (0 until nRows).map { i =>
              if (!isValid(i)) None
              else if (w == 8) Some(new FlatBuf.Reader(bytes).i64(base + i * 8): Any)
              else Some(rdI32(bytes, base + i * 4).toLong: Any)
            }
          case F64 =>
            val (dOff, dLen) = nextBuf()
            if (dLen < nRows.toLong * 8) return None
            val base = bodyStart + dOff.toInt
            val rr = new FlatBuf.Reader(bytes)
            (0 until nRows).map { i =>
              if (!isValid(i)) None
              else Some(java.lang.Double.longBitsToDouble(rr.i64(base + i * 8)): Any)
            }
          case Str =>
            val (oOff, oLen) = nextBuf()
            val (dOff, _) = nextBuf()
            if (oLen < (nRows + 1).toLong * 4) return None
            val ob = bodyStart + oOff.toInt
            val db = bodyStart + dOff.toInt
            (0 until nRows).map { i =>
              if (!isValid(i)) None
              else {
                val s = rdI32(bytes, ob + i * 4)
                val e = rdI32(bytes, ob + (i + 1) * 4)
                if (s < 0 || e < s || db + e > bytes.length)
                  throw new ArrayIndexOutOfBoundsException(e)
                Some(new String(bytes, db + s, e - s, "UTF-8"): Any)
              }
            }
        }
      }
      Batch(nRows, cols)
    }
    Some(ArrowFile(schema, batches))
  }
}
