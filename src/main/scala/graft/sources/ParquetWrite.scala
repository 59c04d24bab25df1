package graft.sources

/** Native Parquet WRITER — the inverse of [[ParquetFooter]] /
  * [[ParquetRead]]: files assembled byte-by-byte from the
  * parquet-format spec (a Thrift-compact writer emitting the same
  * `FileMetaData`/`PageHeader` structures the readers walk, PLAIN
  * value pages compressed through OUR OWN Snappy, one row group,
  * REQUIRED flat columns so V1 pages carry no level sections, full
  * min/max statistics for pruning readers) — and accepted verbatim
  * by Spark's vectorized reader, parquet-mr and DuckDB, which is the
  * point: q145 writes a table with this and reads it back through
  * SPARK, so a foreign reader decoding our bytes is the correctness
  * witness; the spec adds parquet-mr and our-own-reader
  * round trips. Supported physical types: INT64, DOUBLE,
  * BYTE_ARRAY (UTF-8 strings).
  */
object ParquetWrite {

  sealed trait ColSpec { def name: String }
  final case class LongCol(name: String, values: Array[Long]) extends ColSpec
  final case class DoubleCol(name: String, values: Array[Double]) extends ColSpec
  final case class StringCol(name: String, values: Array[String]) extends ColSpec

  /** Write one parquet file (single row group, PLAIN + Snappy). */
  def write(cols: Seq[ColSpec], snappy: Boolean = true): Array[Byte] = {
    require(cols.nonEmpty, "parquet-write: no columns")
    val n = cols.head match {
      case LongCol(_, v) => v.length
      case DoubleCol(_, v) => v.length
      case StringCol(_, v) => v.length
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write('P'); out.write('A'); out.write('R'); out.write('1')

    final case class ChunkMeta(name: String, ptype: Int, dataOff: Long,
                               comp: Long, uncomp: Long, minB: Array[Byte], maxB: Array[Byte])
    val chunks = cols.map { c =>
      val (ptype, plain, minB, maxB) = encodePlain(c)
      require(sizeOf(c) == n, s"parquet-write: ragged column ${c.name}")
      val payload = if (snappy) graft.multimodal.Snappy.compress(plain) else plain
      val header = pageHeader(plain.length, payload.length, n)
      val dataOff = out.size().toLong
      out.write(header)
      out.write(payload)
      ChunkMeta(c.name, ptype, dataOff, (header.length + payload.length).toLong,
        (header.length + plain.length).toLong, minB, maxB)
    }

    // ---- footer: FileMetaData
    val w = new CompactWriter
    w.fieldI32(1, 1) // version
    w.fieldListStruct(2, cols.size + 1) // schema
    // root element: name + num_children
    locally {
      val r = new CompactWriter
      r.fieldBinary(4, "schema".getBytes("UTF-8"))
      r.fieldI32(5, cols.size)
      w.raw(r.stop())
    }
    chunks.foreach { c =>
      val e = new CompactWriter
      e.fieldI32(1, c.ptype) // type
      e.fieldI32(3, 0) // repetition REQUIRED
      e.fieldBinary(4, c.name.getBytes("UTF-8"))
      if (c.ptype == 6) e.fieldI32(6, 0) // converted_type UTF8 → readers surface String
      w.raw(e.stop())
    }
    w.fieldI64(3, n.toLong) // num_rows
    w.fieldListStruct(4, 1) // row_groups
    locally {
      val rg = new CompactWriter
      rg.fieldListStruct(1, chunks.size) // columns
      chunks.foreach { c =>
        val cc = new CompactWriter
        cc.fieldI64(2, c.dataOff) // file_offset
        val md = new CompactWriter
        md.fieldI32(1, c.ptype)
        md.fieldListI32(2, Seq(0)) // encodings: PLAIN
        md.fieldListBinary(3, Seq(c.name.getBytes("UTF-8"))) // path_in_schema
        md.fieldI32(4, if (snappy) 1 else 0) // codec
        md.fieldI64(5, n.toLong)
        md.fieldI64(6, c.uncomp)
        md.fieldI64(7, c.comp)
        md.fieldI64(9, c.dataOff) // data_page_offset
        val st = new CompactWriter // Statistics
        st.fieldI64(3, 0L) // null_count
        st.fieldBinary(5, c.maxB) // max_value
        st.fieldBinary(6, c.minB) // min_value
        md.fieldStruct(12, st.stop())
        cc.fieldStruct(3, md.stop())
        rg.raw(cc.stop())
      }
      rg.fieldI64(2, chunks.map(_.comp).sum) // total_byte_size
      rg.fieldI64(3, n.toLong) // num_rows
      w.raw(rg.stop())
    }
    w.fieldBinary(6, "graft native parquet writer".getBytes("UTF-8"))
    val footer = w.stop()
    out.write(footer)
    val len = footer.length
    out.write(len & 0xff); out.write((len >> 8) & 0xff)
    out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }

  private def sizeOf(c: ColSpec): Int = c match {
    case LongCol(_, v) => v.length
    case DoubleCol(_, v) => v.length
    case StringCol(_, v) => v.length
  }

  /** PLAIN-encode a column; returns (physical type id, bytes,
    * min/max PLAIN statistic bytes).
    */
  private def encodePlain(c: ColSpec): (Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val out = new java.io.ByteArrayOutputStream()
    def le64(v: Long): Array[Byte] = {
      val b = new Array[Byte](8)
      var x = v
      var i = 0
      while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
      b
    }
    c match {
      case LongCol(_, vs) =>
        vs.foreach(v => out.write(le64(v)))
        (2, out.toByteArray, le64(vs.min), le64(vs.max))
      case DoubleCol(_, vs) =>
        vs.foreach(v => out.write(le64(java.lang.Double.doubleToLongBits(v))))
        (5, out.toByteArray,
          le64(java.lang.Double.doubleToLongBits(vs.min)),
          le64(java.lang.Double.doubleToLongBits(vs.max)))
      case StringCol(_, vs) =>
        vs.foreach { s =>
          val b = s.getBytes("UTF-8")
          out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
          out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
          out.write(b)
        }
        (6, out.toByteArray,
          vs.min.getBytes("UTF-8"), vs.max.getBytes("UTF-8"))
    }
  }

  /** Thrift-compact PageHeader for a V1 PLAIN data page of a
    * REQUIRED column (no level sections).
    */
  private def pageHeader(uncomp: Int, comp: Int, numValues: Int): Array[Byte] = {
    val w = new CompactWriter
    w.fieldI32(1, 0) // DATA_PAGE
    w.fieldI32(2, uncomp)
    w.fieldI32(3, comp)
    val dph = new CompactWriter
    dph.fieldI32(1, numValues)
    dph.fieldI32(2, 0) // encoding PLAIN
    dph.fieldI32(3, 3) // definition_level_encoding RLE (vacuous)
    dph.fieldI32(4, 3) // repetition_level_encoding RLE (vacuous)
    w.fieldStruct(5, dph.stop())
    w.stop()
  }
}

/** Minimal Thrift compact-protocol WRITER: delta-encoded field
  * headers, zigzag varints, length-prefixed binaries, struct lists.
  */
private[sources] final class CompactWriter {
  private val out = new java.io.ByteArrayOutputStream()
  private var lastId = 0

  private def uvarint(value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zigzag(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
  private def header(id: Int, tpe: Int): Unit = {
    val delta = id - lastId
    require(delta >= 1 && delta <= 15, s"thrift-write: field delta $delta unsupported")
    out.write((delta << 4) | tpe)
    lastId = id
  }
  def fieldI32(id: Int, v: Int): Unit = { header(id, 5); zigzag(v.toLong) }
  def fieldI64(id: Int, v: Long): Unit = { header(id, 6); zigzag(v) }
  def fieldBinary(id: Int, v: Array[Byte]): Unit = {
    header(id, 8); uvarint(v.length.toLong); out.write(v)
  }
  def fieldStruct(id: Int, body: Array[Byte]): Unit = { header(id, 12); out.write(body) }
  /** Open a list-of-structs field; follow with `count` `raw` bodies. */
  def fieldListStruct(id: Int, count: Int): Unit = {
    header(id, 9)
    if (count < 15) out.write((count << 4) | 12)
    else { out.write(0xf0 | 12); uvarint(count.toLong) }
  }
  def fieldListI32(id: Int, vs: Seq[Int]): Unit = {
    header(id, 9)
    if (vs.size < 15) out.write((vs.size << 4) | 5)
    else { out.write(0xf0 | 5); uvarint(vs.size.toLong) }
    vs.foreach(v => zigzag(v.toLong))
  }
  def fieldListBinary(id: Int, vs: Seq[Array[Byte]]): Unit = {
    header(id, 9)
    if (vs.size < 15) out.write((vs.size << 4) | 8)
    else { out.write(0xf0 | 8); uvarint(vs.size.toLong) }
    vs.foreach { v => uvarint(v.length.toLong); out.write(v) }
  }
  def raw(bytes: Array[Byte]): Unit = out.write(bytes)
  /** Close the struct (STOP byte) and return its bytes. */
  def stop(): Array[Byte] = { out.write(0); out.toByteArray }
}
