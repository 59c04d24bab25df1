package graft.sources

/** Native Parquet FOOTER reader — the Thrift COMPACT protocol walk
  * (field-delta headers, zigzag varints, length-prefixed binaries,
  * nested structs/lists) over the `FileMetaData` structure from the
  * public parquet-format spec, in pure JVM. This is the metadata a
  * 100 TB scan planner actually consumes: row counts, per-row-group
  * per-column value counts, codecs, physical types, and the min/max
  * STATISTICS that drive row-group pruning — read directly from the
  * file tail (`…footer, u32le footer_len, "PAR1"`) without starting
  * a Spark scan. Unknown/irrelevant fields are skipped generically
  * by type (forward compatibility, the Thrift contract), so footers
  * from any writer walk cleanly. Statistics decode by physical type
  * (PLAIN little-endian ints/doubles, raw UTF-8 byte arrays),
  * preferring the modern `min_value`/`max_value` fields over the
  * deprecated pair. q143's oracle checks the decoded statistics
  * against the DATA ITSELF (SQL count/min/max over the same table)
  * — the strongest possible witness that the walk is right; the
  * spec additionally cross-checks parquet-mr's own footer reader.
  */
object ParquetFooter {

  /** `nullCount` is None when the optional Statistics.null_count
    * field is absent from the footer — callers must not treat an
    * unknown count as zero (a file without the field may still hold
    * nulls, and null-predicate pruning on a 0 default would silently
    * drop rows).
    */
  final case class ColumnStats(
      rowGroup: Int, path: String, ptype: String, codec: String,
      numValues: Long, nullCount: Option[Long],
      minNum: Option[Double], maxNum: Option[Double],
      minStr: Option[String], maxStr: Option[String],
      dataPageOffset: Long = -1L, dictPageOffset: Option[Long] = None,
      totalCompressedSize: Long = -1L)

  /** (name, repetition) per leaf — repetition 0 REQUIRED, 1 OPTIONAL,
    * 2 REPEATED; flat tables have max definition level = repetition.
    */
  final case class FooterInfo(numRows: Long, nRowGroups: Int, createdBy: String,
                              columns: Vector[ColumnStats],
                              leafRepetition: Map[String, Int], valid: Boolean)

  private val Invalid = FooterInfo(0L, 0, "", Vector.empty, Map.empty, valid = false)

  private val TypeNames = Array("BOOLEAN", "INT32", "INT64", "INT96", "FLOAT",
    "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO", "BROTLI",
    "LZ4", "ZSTD", "LZ4_RAW")

  def readFile(path: String): FooterInfo =
    try read(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    catch { case _: Exception => Invalid }

  def read(bytes: Array[Byte]): FooterInfo =
    try readUnsafe(bytes)
    catch { case _: Exception => Invalid }

  private def readUnsafe(bytes: Array[Byte]): FooterInfo = {
    val n = bytes.length
    require(n >= 12, "parquet: too short")
    require(bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' && bytes(3) == '1',
      "parquet: bad leading magic")
    require(bytes(n - 4) == 'P' && bytes(n - 3) == 'A' && bytes(n - 2) == 'R' && bytes(n - 1) == '1',
      "parquet: bad trailing magic")
    val footerLen = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
      ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
    require(footerLen > 0 && footerLen <= n - 12, "parquet: bad footer length")
    val in = new Compact(bytes, n - 8 - footerLen, n - 8)
    parseFileMetaData(in)
  }

  // ------------------------------------------------------- thrift compact

  private final class Compact(bytes: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def u8(): Int = {
      require(pos < end, "thrift: truncated")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def uvarint(): Long = {
      var v = 0L
      var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        require(shift < 63, "thrift: varint too long")
        v |= (b & 0x7fL) << shift
        shift += 7
        b = u8()
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
    def string(): String = new String(binary(), java.nio.charset.StandardCharsets.UTF_8)

    /** Skip a value of the given compact type id. */
    def skip(tpe: Int): Unit = tpe match {
      case 1 | 2 => () // bool true/false carried in the field header
      case 3 => u8(); ()
      case 4 | 5 | 6 => zigzag(); ()
      case 7 => pos += 8; require(pos <= end, "thrift: truncated double")
      case 8 => binary(); ()
      case 9 | 10 =>
        val (n, et) = listHeader()
        var i = 0L
        while (i < n) { skipListElem(et); i += 1 }
      case 11 =>
        val sz = uvarint()
        if (sz > 0) {
          val kv = u8()
          val kt = (kv >> 4) & 0xf
          val vt = kv & 0xf
          var i = 0L
          while (i < sz) { skipListElem(kt); skipListElem(vt); i += 1 }
        }
      case 12 => skipStruct()
      case t => throw new IllegalStateException(s"thrift: unknown type $t")
    }
    private def skipListElem(tpe: Int): Unit = tpe match {
      case 1 | 2 => u8(); () // bools in lists are one byte each
      case t => skip(t)
    }
    def skipStruct(): Unit = {
      var lastId = 0
      var stop = false
      while (!stop) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val delta = (h >> 4) & 0xf
          val tpe = h & 0xf
          lastId = if (delta != 0) lastId + delta else zigzag().toInt
          skip(tpe)
        }
      }
    }
    def listHeader(): (Long, Int) = {
      val h = u8()
      val et = h & 0xf
      val sz = (h >> 4) & 0xf
      (if (sz == 15) uvarint() else sz.toLong, et)
    }

    /** Walk a struct, dispatching each (fieldId, type) to `f`; fields
      * the handler declines are skipped generically.
      */
    def struct(f: (Int, Int, Compact) => Boolean): Unit = {
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

  // ------------------------------------------------------- FileMetaData

  private def parseFileMetaData(in: Compact): FooterInfo = {
    var numRows = 0L
    var createdBy = ""
    val columns = Vector.newBuilder[ColumnStats]
    val leaves = Map.newBuilder[String, Int]
    var nRowGroups = 0
    in.struct { (id, tpe, c) =>
      (id, tpe) match {
        case (3, 6) => numRows = c.zigzag(); true
        case (6, 8) => createdBy = c.string(); true
        case (2, 9) => // schema: list<SchemaElement>, root first
          val (n, _) = c.listHeader()
          var i = 0L
          while (i < n) {
            var name = ""
            var repetition = 0
            var numChildren = 0
            c.struct { (sid, stpe, s) =>
              (sid, stpe) match {
                case (3, 5) => repetition = s.zigzag().toInt; true
                case (4, 8) => name = s.string(); true
                case (5, 5) => numChildren = s.zigzag().toInt; true
                case _ => false
              }
            }
            if (i > 0 && numChildren == 0) leaves += (name -> repetition)
            i += 1
          }
          true
        case (4, 9) => // row_groups: list<RowGroup>
          val (n, _) = c.listHeader()
          var i = 0L
          while (i < n) {
            parseRowGroup(c, nRowGroups, columns)
            nRowGroups += 1
            i += 1
          }
          true
        case _ => false
      }
    }
    // A zero-row file (e.g. an empty writer partition) legally carries
    // an empty row-group list; only a file CLAIMING rows must have one.
    require(nRowGroups > 0 || numRows == 0, "parquet: rows claimed but no row groups")
    FooterInfo(numRows, nRowGroups, createdBy, columns.result(), leaves.result(), valid = true)
  }

  private def parseRowGroup(in: Compact, rgIdx: Int,
                            out: collection.mutable.Builder[ColumnStats, Vector[ColumnStats]]): Unit =
    in.struct { (id, tpe, c) =>
      (id, tpe) match {
        case (1, 9) => // columns: list<ColumnChunk>
          val (n, _) = c.listHeader()
          var i = 0L
          while (i < n) { parseColumnChunk(c, rgIdx, out); i += 1 }
          true
        case _ => false
      }
    }

  private def parseColumnChunk(in: Compact, rgIdx: Int,
                               out: collection.mutable.Builder[ColumnStats, Vector[ColumnStats]]): Unit = {
    in.struct { (id, tpe, c) =>
      (id, tpe) match {
        case (3, 12) => parseColumnMetaData(c, rgIdx, out); true
        case _ => false
      }
    }
  }

  private def parseColumnMetaData(in: Compact, rgIdx: Int,
                                  out: collection.mutable.Builder[ColumnStats, Vector[ColumnStats]]): Unit = {
    var ptype = -1
    var codec = -1
    var numValues = 0L
    var path = Vector.empty[String]
    var nullCount: Option[Long] = None
    var minB: Array[Byte] = null
    var maxB: Array[Byte] = null
    var minDeprecated: Array[Byte] = null
    var maxDeprecated: Array[Byte] = null
    var dataPageOffset = -1L
    var dictPageOffset: Option[Long] = None
    var totalCompressed = -1L
    in.struct { (id, tpe, c) =>
      (id, tpe) match {
        case (1, 5) => ptype = c.zigzag().toInt; true
        case (3, 9) =>
          val (n, _) = c.listHeader()
          var i = 0L
          while (i < n) { path = path :+ c.string(); i += 1 }
          true
        case (4, 5) => codec = c.zigzag().toInt; true
        case (5, 6) => numValues = c.zigzag(); true
        case (7, 6) => totalCompressed = c.zigzag(); true
        case (9, 6) => dataPageOffset = c.zigzag(); true
        case (11, 6) => dictPageOffset = Some(c.zigzag()); true
        case (12, 12) => // Statistics
          c.struct { (sid, stpe, s) =>
            (sid, stpe) match {
              case (1, 8) => maxDeprecated = s.binary(); true
              case (2, 8) => minDeprecated = s.binary(); true
              case (3, 6) => nullCount = Some(s.zigzag()); true
              case (5, 8) => maxB = s.binary(); true
              case (6, 8) => minB = s.binary(); true
              case _ => false
            }
          }
          true
        case _ => false
      }
    }
    val mn = if (minB != null) minB else minDeprecated
    val mx = if (maxB != null) maxB else maxDeprecated
    def num(b: Array[Byte]): Option[Double] = Option(b).flatMap { v =>
      ptype match {
        case 1 => // INT32, PLAIN little-endian
          Some(((v(0) & 0xff) | ((v(1) & 0xff) << 8) | ((v(2) & 0xff) << 16) |
            ((v(3) & 0xff) << 24)).toDouble)
        case 2 => // INT64
          var x = 0L
          var i = 0
          while (i < 8) { x |= (v(i) & 0xffL) << (8 * i); i += 1 }
          Some(x.toDouble)
        case 4 =>
          Some(java.lang.Float.intBitsToFloat((v(0) & 0xff) | ((v(1) & 0xff) << 8) |
            ((v(2) & 0xff) << 16) | ((v(3) & 0xff) << 24)).toDouble)
        case 5 =>
          var x = 0L
          var i = 0
          while (i < 8) { x |= (v(i) & 0xffL) << (8 * i); i += 1 }
          Some(java.lang.Double.longBitsToDouble(x))
        case _ => None
      }
    }
    def str(b: Array[Byte]): Option[String] =
      if (ptype == 6) Option(b).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      else None
    out += ColumnStats(rgIdx, path.mkString("."),
      if (ptype >= 0 && ptype < TypeNames.length) TypeNames(ptype) else s"UNKNOWN($ptype)",
      if (codec >= 0 && codec < CodecNames.length) CodecNames(codec) else s"UNKNOWN($codec)",
      numValues, nullCount, num(mn), num(mx), str(mn), str(mx),
      dataPageOffset, dictPageOffset, totalCompressed)
  }
}
