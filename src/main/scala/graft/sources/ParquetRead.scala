package graft.sources

/** Native Parquet COLUMN-CHUNK decode — the byte-level read path
  * under [[ParquetFooter]]'s planning walk, from the public
  * parquet-format spec: Thrift-compact `PageHeader`s, page payloads
  * decompressed through OUR OWN [[graft.multimodal.Snappy]] (or raw
  * store / gzip), PLAIN-encoded dictionary pages, V1 data pages with
  * RLE/BIT-PACKED-HYBRID definition levels (4-byte length prefix,
  * varint run headers, LSB-first bit packing) and RLE_DICTIONARY /
  * PLAIN_DICTIONARY index runs (leading bit-width byte), plus plain
  * PLAIN value pages. Flat schemas only (max repetition level 0) —
  * the shape analytic tables actually have; nested columns are
  * rejected cleanly. Values surface as `Option[Any]` in ROW ORDER
  * with nulls where the definition level says so, so q144 can prove
  * the whole chain against SQL over the same table: one hash
  * certifies the page walk, the hybrid decoder, the dictionary
  * indirection, and the Snappy layer at once.
  */
object ParquetRead {

  /** Decode one column chunk of `path` from row group `rg`.
    * Returns values in row order, None = null.
    */
  def readColumn(bytes: Array[Byte], info: ParquetFooter.FooterInfo,
                 path: String, rg: Int = 0): Vector[Option[Any]] = {
    val col = info.columns.find(c => c.path == path && c.rowGroup == rg)
      .getOrElse(throw new IllegalStateException(s"parquet: no column $path in rg $rg"))
    val leafName = path.split('.').last
    val repetition = info.leafRepetition.getOrElse(leafName, 0)
    require(repetition != 2, "parquet: repeated (nested) columns not supported")
    val maxDef = repetition // flat schema: OPTIONAL → 1, REQUIRED → 0
    val start = col.dictPageOffset match {
      case Some(d) => math.min(d, col.dataPageOffset)
      case None => col.dataPageOffset
    }
    require(start >= 0 && col.totalCompressedSize > 0, "parquet: missing chunk offsets")
    val end = start + col.totalCompressedSize
    require(end <= bytes.length, "parquet: chunk out of range")
    var pos = start.toInt
    var dictionary: Vector[Any] = null
    val out = Vector.newBuilder[Option[Any]]
    var remaining = col.numValues
    while (pos < end && remaining > 0) {
      val (header, consumed) = readPageHeader(bytes, pos, end.toInt)
      pos += consumed
      require(pos + header.compressedSize <= end, "parquet: page overruns chunk")
      val raw = decompress(bytes, pos, header.compressedSize, header.uncompressedSize, col.codec)
      pos += header.compressedSize
      header.pageType match {
        case 2 => // dictionary page: PLAIN values
          dictionary = decodePlain(raw, 0, raw.length, header.numValues, col.ptype)._1
        case 0 => // data page v1
          var off = 0
          // flat: no repetition levels; definition levels when maxDef > 0
          val defs: Array[Int] =
            if (maxDef == 0) Array.fill(header.numValues)(0)
            else {
              val len = (raw(off) & 0xff) | ((raw(off + 1) & 0xff) << 8) |
                ((raw(off + 2) & 0xff) << 16) | ((raw(off + 3) & 0xff) << 24)
              off += 4
              val d = decodeHybrid(raw, off, off + len, bitWidth(maxDef), header.numValues)
              off += len
              d
            }
          val nPresent = defs.count(_ == maxDef)
          val values: Vector[Any] = header.encoding match {
            case 0 => // PLAIN
              decodePlain(raw, off, raw.length, nPresent, col.ptype)._1
            case 2 | 8 => // PLAIN_DICTIONARY | RLE_DICTIONARY
              require(dictionary != null, "parquet: data page before dictionary")
              val bw = raw(off) & 0xff
              off += 1
              val idx = decodeHybrid(raw, off, raw.length, bw, nPresent)
              idx.iterator.map { i =>
                require(i >= 0 && i < dictionary.size, "parquet: dictionary index out of range")
                dictionary(i)
              }.toVector
            case e => throw new IllegalStateException(s"parquet: unsupported encoding $e")
          }
          var vi = 0
          defs.foreach { d =>
            if (d == maxDef) { out += Some(values(vi)); vi += 1 }
            else out += None
          }
          remaining -= header.numValues
        case 3 => throw new IllegalStateException("parquet: data page v2 not supported")
        case _ => () // index pages etc: skip
      }
    }
    require(remaining == 0, "parquet: chunk decoded short of num_values")
    out.result()
  }

  // ------------------------------------------------------------ helpers

  private def bitWidth(maxValue: Int): Int =
    if (maxValue == 0) 0 else 32 - Integer.numberOfLeadingZeros(maxValue)

  private final case class PageHeader(pageType: Int, uncompressedSize: Int,
                                      compressedSize: Int, numValues: Int, encoding: Int)

  /** PageHeader via the same Thrift-compact walker the footer uses. */
  private def readPageHeader(bytes: Array[Byte], off: Int, end: Int): (PageHeader, Int) = {
    val in = new CompactReader(bytes, off, end)
    var pageType = -1
    var uncomp = 0
    var comp = 0
    var numValues = 0
    var encoding = -1
    in.struct { (id, tpe, c) =>
      (id, tpe) match {
        case (1, 5) => pageType = c.zigzag().toInt; true
        case (2, 5) => uncomp = c.zigzag().toInt; true
        case (3, 5) => comp = c.zigzag().toInt; true
        case (5, 12) | (7, 12) => // DataPageHeader | DictionaryPageHeader
          c.struct { (fid, ftpe, f) =>
            (fid, ftpe) match {
              case (1, 5) => numValues = f.zigzag().toInt; true
              case (2, 5) => encoding = f.zigzag().toInt; true
              case _ => false
            }
          }
          true
        case _ => false
      }
    }
    require(pageType >= 0 && comp >= 0, "parquet: bad page header")
    (PageHeader(pageType, uncomp, comp, numValues, encoding), in.pos - off)
  }

  private def decompress(bytes: Array[Byte], off: Int, compLen: Int, uncompLen: Int,
                         codec: String): Array[Byte] = codec match {
    case "UNCOMPRESSED" => java.util.Arrays.copyOfRange(bytes, off, off + compLen)
    case "SNAPPY" =>
      val out = graft.multimodal.Snappy.uncompress(
        java.util.Arrays.copyOfRange(bytes, off, off + compLen))
      require(out.length == uncompLen, "parquet: page size mismatch after snappy")
      out
    case "GZIP" =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes, off, compLen))
      val out = in.readAllBytes()
      require(out.length == uncompLen, "parquet: page size mismatch after gzip")
      out
    case c => throw new IllegalStateException(s"parquet: unsupported codec $c")
  }

  /** PLAIN decode `n` values of the physical type starting at `off`;
    * returns (values, bytes consumed).
    */
  private def decodePlain(raw: Array[Byte], off: Int, end: Int, n: Int,
                          ptype: String): (Vector[Any], Int) = {
    val out = Vector.newBuilder[Any]
    var pos = off
    var i = 0
    def need(k: Int): Unit =
      require(pos + k <= end, "parquet: plain values truncated")
    while (i < n) {
      ptype match {
        case "INT32" =>
          need(4)
          out += ((raw(pos) & 0xff) | ((raw(pos + 1) & 0xff) << 8) |
            ((raw(pos + 2) & 0xff) << 16) | ((raw(pos + 3) & 0xff) << 24))
          pos += 4
        case "INT64" =>
          need(8)
          var v = 0L
          var k = 0
          while (k < 8) { v |= (raw(pos + k) & 0xffL) << (8 * k); k += 1 }
          out += v
          pos += 8
        case "DOUBLE" =>
          need(8)
          var v = 0L
          var k = 0
          while (k < 8) { v |= (raw(pos + k) & 0xffL) << (8 * k); k += 1 }
          out += java.lang.Double.longBitsToDouble(v)
          pos += 8
        case "FLOAT" =>
          need(4)
          out += java.lang.Float.intBitsToFloat((raw(pos) & 0xff) | ((raw(pos + 1) & 0xff) << 8) |
            ((raw(pos + 2) & 0xff) << 16) | ((raw(pos + 3) & 0xff) << 24))
          pos += 4
        case "BYTE_ARRAY" =>
          need(4)
          val len = (raw(pos) & 0xff) | ((raw(pos + 1) & 0xff) << 8) |
            ((raw(pos + 2) & 0xff) << 16) | ((raw(pos + 3) & 0xff) << 24)
          pos += 4
          require(len >= 0, "parquet: negative byte-array length")
          need(len)
          out += new String(raw, pos, len, java.nio.charset.StandardCharsets.UTF_8)
          pos += len
        case "BOOLEAN" =>
          // bit-packed booleans: handled as a block below
          throw new IllegalStateException("parquet: plain boolean not supported")
        case t => throw new IllegalStateException(s"parquet: unsupported type $t")
      }
      i += 1
    }
    (out.result(), pos - off)
  }

  /** RLE/bit-packed hybrid decode of `n` values at `bitWidth`. */
  private[sources] def decodeHybrid(raw: Array[Byte], off: Int, end: Int,
                                    bitWidth: Int, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var produced = 0
    if (bitWidth == 0) return out // all zero
    var pos = off
    def u8(): Int = {
      require(pos < end, "parquet: hybrid run truncated")
      val v = raw(pos) & 0xff; pos += 1; v
    }
    def uvarint(): Long = {
      var v = 0L
      var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7; b = u8()
        require(shift < 35, "parquet: hybrid varint too long")
      }
      v | ((b & 0x7fL) << shift)
    }
    val byteW = (bitWidth + 7) / 8
    while (produced < n) {
      val header = uvarint()
      if ((header & 1L) == 0L) { // RLE run
        val count = (header >>> 1).toInt
        var v = 0
        var k = 0
        while (k < byteW) { v |= u8() << (8 * k); k += 1 }
        var i = 0
        while (i < count && produced < n) { out(produced) = v; produced += 1; i += 1 }
        require(i == count || produced == n, "parquet: rle run overruns")
      } else { // bit-packed groups of 8, LSB-first
        val groups = (header >>> 1).toInt
        var bitPos = 0
        val totalBits = groups * 8 * bitWidth
        val base = pos
        pos += (totalBits + 7) / 8
        require(pos <= end, "parquet: bit-packed run truncated")
        var i = 0
        while (i < groups * 8 && produced < n) {
          var v = 0
          var b = 0
          while (b < bitWidth) {
            val idx = bitPos + b
            v |= ((raw(base + (idx >> 3)) >> (idx & 7)) & 1) << b
            b += 1
          }
          bitPos += bitWidth
          out(produced) = v
          produced += 1
          i += 1
        }
      }
    }
    out
  }
}

/** Standalone Thrift-compact reader (shared shape with the footer's
  * internal one; page headers live outside the footer region).
  */
private[sources] final class CompactReader(bytes: Array[Byte], start: Int, end: Int) {
  var pos: Int = start
  private def u8(): Int = {
    require(pos < end, "thrift: truncated")
    val v = bytes(pos) & 0xff; pos += 1; v
  }
  private def uvarint(): Long = {
    var v = 0L
    var shift = 0
    var b = u8()
    while ((b & 0x80) != 0) {
      require(shift < 63, "thrift: varint too long")
      v |= (b & 0x7fL) << shift; shift += 7; b = u8()
    }
    v | ((b & 0x7fL) << shift)
  }
  def zigzag(): Long = { val v = uvarint(); (v >>> 1) ^ -(v & 1L) }
  def binary(): Array[Byte] = {
    val len = uvarint()
    require(len >= 0 && pos + len <= end, "thrift: bad binary length")
    val r = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
    pos += len.toInt
    r
  }
  def skip(tpe: Int): Unit = tpe match {
    case 1 | 2 => ()
    case 3 => u8(); ()
    case 4 | 5 | 6 => zigzag(); ()
    case 7 => pos += 8; require(pos <= end, "thrift: truncated double")
    case 8 => binary(); ()
    case 9 | 10 =>
      val h = u8()
      val et = h & 0xf
      val sz = (h >> 4) & 0xf
      val count = if (sz == 15) uvarint() else sz.toLong
      var i = 0L
      while (i < count) { if (et == 1 || et == 2) u8() else skip(et); i += 1 }
    case 11 =>
      val sz = uvarint()
      if (sz > 0) {
        val kv = u8()
        var i = 0L
        while (i < sz) { skip((kv >> 4) & 0xf); skip(kv & 0xf); i += 1 }
      }
    case 12 => struct((_, _, _) => false)
    case t => throw new IllegalStateException(s"thrift: unknown type $t")
  }
  def struct(f: (Int, Int, CompactReader) => Boolean): Unit = {
    var lastId = 0
    var stop = false
    while (!stop) {
      val h = u8()
      if (h == 0) stop = true
      else {
        val delta = (h >> 4) & 0xf
        val tpe = h & 0xf
        lastId = if (delta != 0) lastId + delta else zigzag().toInt
        if (!f(lastId, tpe, this)) skip(tpe)
      }
    }
  }
}
