package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

import graft.util.Json

/** Apache Avro Object Container File reader + writer in pure JVM —
  * the row-oriented container dataset releases and Hadoop pipelines
  * ship alongside Parquet. Everything from the public spec: the
  * `Obj\1` magic, the file-metadata Avro map (`avro.schema` JSON,
  * `avro.codec`), the 16-byte sync marker, and data blocks framed as
  * (record count, byte size, payload, sync) — the framing that makes
  * OCF SPLITTABLE: a scale reader seeks to any offset, scans for the
  * sync marker, and resumes on a block boundary, which is why the
  * format fits 100 TB ingestion. Binary encoding implemented in
  * full for the supported schema subset: zigzag-varint ints/longs,
  * little-endian IEEE floats/doubles, length-prefixed strings/bytes,
  * records (field concatenation in schema order), arrays/maps (block
  * runs), unions (branch index + value), enums, fixed. Codecs: null,
  * deflate (RAW Deflate, no zlib wrapper — the spec's choice), and
  * snappy (our own [[Snappy]] + the Avro-specific 4-byte BIG-ENDIAN
  * CRC32 of the UNCOMPRESSED payload, VERIFIED per block). The
  * schema JSON is parsed by a self-contained recursive-descent JSON
  * reader; named-type references resolve through a registry.
  * Malformed files (bad magic, sync mismatch, CRC mismatch, lying
  * counts, truncation) yield `valid=false` / Nil, never exceptions.
  * AvroSpec cross-checks the real Apache Avro library (on the Spark
  * classpath) in BOTH directions for all three codecs.
  */
object Avro {

  // ---------------------------------------------------------------- schema

  sealed trait Schema
  case object SNull extends Schema
  case object SBoolean extends Schema
  case object SInt extends Schema
  case object SLong extends Schema
  case object SFloat extends Schema
  case object SDouble extends Schema
  case object SString extends Schema
  case object SBytes extends Schema
  final case class SRecord(name: String, fields: Vector[(String, Schema)]) extends Schema
  final case class SArray(items: Schema) extends Schema
  final case class SMap(values: Schema) extends Schema
  final case class SUnion(branches: Vector[Schema]) extends Schema
  final case class SEnum(name: String, symbols: Vector[String]) extends Schema
  final case class SFixed(name: String, size: Int) extends Schema

  def parseSchema(json: String): Schema =
    fromJson(Json.parse(json), collection.mutable.Map.empty)

  private def fromJson(j: Any, reg: collection.mutable.Map[String, Schema]): Schema = j match {
    case s: String => s match {
      case "null" => SNull
      case "boolean" => SBoolean
      case "int" => SInt
      case "long" => SLong
      case "float" => SFloat
      case "double" => SDouble
      case "string" => SString
      case "bytes" => SBytes
      case name => reg.getOrElse(name,
        throw new IllegalStateException(s"avro: unknown type $name"))
    }
    case arr: Vector[_] => SUnion(arr.map(fromJson(_, reg)).toVector)
    case m: Map[_, _] =>
      val obj = m.asInstanceOf[Map[String, Any]]
      obj("type") match {
        case "record" =>
          val name = obj("name").asInstanceOf[String]
          val fields = obj("fields").asInstanceOf[Vector[Any]].map { f =>
            val fo = f.asInstanceOf[Map[String, Any]]
            (fo("name").asInstanceOf[String], fromJson(fo("type"), reg))
          }.toVector
          val rec = SRecord(name, fields)
          reg(name) = rec
          rec
        case "array" => SArray(fromJson(obj("items"), reg))
        case "map" => SMap(fromJson(obj("values"), reg))
        case "enum" =>
          val e = SEnum(obj("name").asInstanceOf[String],
            obj("symbols").asInstanceOf[Vector[Any]].map(_.asInstanceOf[String]).toVector)
          reg(e.name) = e
          e
        case "fixed" =>
          val f = SFixed(obj("name").asInstanceOf[String],
            obj("size").asInstanceOf[Number].intValue)
          reg(f.name) = f
          f
        case t => fromJson(t, reg) // {"type": "string"} wrapper form
      }
    case other => throw new IllegalStateException(s"avro: bad schema node $other")
  }

  /** Schema subset → its canonical-enough JSON (what our writer puts
    * in `avro.schema`; the real Avro parser accepts it verbatim).
    */
  def schemaJson(s: Schema): String = s match {
    case SNull => "\"null\""
    case SBoolean => "\"boolean\""
    case SInt => "\"int\""
    case SLong => "\"long\""
    case SFloat => "\"float\""
    case SDouble => "\"double\""
    case SString => "\"string\""
    case SBytes => "\"bytes\""
    case SRecord(name, fields) =>
      fields.map { case (n, t) => s"""{"name":"$n","type":${schemaJson(t)}}""" }
        .mkString(s"""{"type":"record","name":"$name","fields":[""", ",", "]}")
    case SArray(items) => s"""{"type":"array","items":${schemaJson(items)}}"""
    case SMap(values) => s"""{"type":"map","values":${schemaJson(values)}}"""
    case SUnion(bs) => bs.map(schemaJson).mkString("[", ",", "]")
    case SEnum(name, syms) =>
      s"""{"type":"enum","name":"$name","symbols":[${syms.map("\"" + _ + "\"").mkString(",")}]}"""
    case SFixed(name, size) => s"""{"type":"fixed","name":"$name","size":$size}"""
  }

  // ---------------------------------------------------------------- write

  /** Encode records (one Seq[Any] per record, field values in schema
    * order) into an OCF with `blockSize` records per data block.
    * Codec: "null" | "deflate" | "snappy". The sync marker derives
    * deterministically from `syncSeed` so tests are reproducible.
    */
  def encode(schema: SRecord, records: Seq[Seq[Any]], codec: String = "null",
             blockSize: Int = 100, syncSeed: Long = 0L): Array[Byte] = {
    require(Set("null", "deflate", "snappy")(codec), s"unsupported codec $codec")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1))
    val meta = Vector(
      "avro.schema" -> schemaJson(schema).getBytes(UTF_8),
      "avro.codec" -> codec.getBytes(UTF_8))
    writeLong(out, meta.size.toLong)
    meta.foreach { case (k, v) =>
      val kb = k.getBytes(UTF_8)
      writeLong(out, kb.length.toLong); out.write(kb)
      writeLong(out, v.length.toLong); out.write(v)
    }
    writeLong(out, 0L)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro-sync-$syncSeed".getBytes(UTF_8))
    out.write(sync)
    records.grouped(math.max(1, blockSize)).foreach { group =>
      val body = new java.io.ByteArrayOutputStream()
      group.foreach(r => writeDatum(body, schema, r))
      val raw = body.toByteArray
      val payload = codec match {
        case "null" => raw
        case "deflate" => deflateRaw(raw)
        case "snappy" =>
          val c = Snappy.compress(raw)
          val crc = new java.util.zip.CRC32()
          crc.update(raw)
          val v = crc.getValue
          c ++ Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      }
      writeLong(out, group.size.toLong)
      writeLong(out, payload.length.toLong)
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  private def writeDatum(out: java.io.ByteArrayOutputStream, s: Schema, v: Any): Unit = (s, v) match {
    case (SNull, _) => ()
    case (SBoolean, b: Boolean) => out.write(if (b) 1 else 0)
    case (SInt, i: Int) => writeLong(out, i.toLong)
    case (SLong, l: Long) => writeLong(out, l)
    case (SFloat, f: Float) =>
      val bits = java.lang.Float.floatToIntBits(f)
      out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
      out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
    case (SDouble, d: Double) =>
      var bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    case (SString, str: String) =>
      val b = str.getBytes(UTF_8)
      writeLong(out, b.length.toLong); out.write(b)
    case (SBytes, b: Array[Byte]) =>
      writeLong(out, b.length.toLong); out.write(b)
    case (SRecord(_, fields), vals: Seq[_]) =>
      require(fields.size == vals.size, "record arity mismatch")
      fields.zip(vals).foreach { case ((_, ft), fv) => writeDatum(out, ft, fv) }
    case (SArray(items), xs: Seq[_]) =>
      if (xs.nonEmpty) {
        writeLong(out, xs.size.toLong)
        xs.foreach(writeDatum(out, items, _))
      }
      writeLong(out, 0L)
    case (SMap(values), m: Map[_, _]) =>
      if (m.nonEmpty) {
        writeLong(out, m.size.toLong)
        m.asInstanceOf[Map[String, Any]].foreach { case (k, mv) =>
          val kb = k.getBytes(UTF_8)
          writeLong(out, kb.length.toLong); out.write(kb)
          writeDatum(out, values, mv)
        }
      }
      writeLong(out, 0L)
    case (SUnion(branches), _) =>
      val idx = branches.indexWhere(b => accepts(b, v))
      require(idx >= 0, s"no union branch for $v")
      writeLong(out, idx.toLong)
      writeDatum(out, branches(idx), v)
    case (SEnum(_, symbols), sym: String) =>
      val idx = symbols.indexOf(sym)
      require(idx >= 0, s"unknown enum symbol $sym")
      writeLong(out, idx.toLong)
    case (SFixed(_, size), b: Array[Byte]) =>
      require(b.length == size, "fixed size mismatch")
      out.write(b)
    case (sch, value) => throw new IllegalStateException(s"avro: cannot write $value as $sch")
  }

  private def accepts(s: Schema, v: Any): Boolean = (s, v) match {
    case (SNull, null) => true
    case (SBoolean, _: Boolean) => true
    case (SInt, _: Int) => true
    case (SLong, _: Long) => true
    case (SFloat, _: Float) => true
    case (SDouble, _: Double) => true
    case (SString, _: String) => true
    case (SBytes, _: Array[Byte]) => true
    case (_: SRecord, _: Seq[_]) => true
    case (_: SArray, _: Seq[_]) => true
    case (_: SMap, _: Map[_, _]) => true
    case (_: SEnum, _: String) => true
    case (_: SFixed, _: Array[Byte]) => true
    case _ => false
  }

  /** Zigzag varint — the Avro long encoding. */
  private def writeLong(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63)
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---------------------------------------------------------------- read

  final case class AvroInfo(
      schemaName: String, codec: String, nBlocks: Long, nRecords: Long, valid: Boolean)

  private val Invalid = AvroInfo("", "", 0L, 0L, valid = false)

  /** Stats face: header + block framing + full record decode, any
    * failure ⇒ valid=false.
    */
  def decode(bytes: Array[Byte]): AvroInfo =
    try {
      val (schema, codec, recs, blocks) = readUnsafe(bytes)
      val name = schema match { case SRecord(n, _) => n; case _ => "" }
      AvroInfo(name, codec, blocks, recs.size.toLong, valid = true)
    } catch { case _: Exception => Invalid }

  /** Ingestion face: every record as field values in schema order
    * (empty ⇒ malformed or record-free).
    */
  def records(bytes: Array[Byte]): Seq[Seq[Any]] =
    try readUnsafe(bytes)._3
    catch { case _: Exception => Nil }

  /** Field names of the top-level record schema (empty ⇒ malformed). */
  def fieldNames(bytes: Array[Byte]): Seq[String] =
    try readUnsafe(bytes)._1 match {
      case SRecord(_, fs) => fs.map(_._1)
      case _ => Nil
    } catch { case _: Exception => Nil }

  private def readUnsafe(bytes: Array[Byte]): (Schema, String, Seq[Seq[Any]], Long) = {
    val in = new Reader(bytes)
    require(in.u8() == 'O' && in.u8() == 'b' && in.u8() == 'j' && in.u8() == 1, "bad magic")
    var schemaJson: String = null
    var codec = "null"
    var blockCount = in.readLong()
    while (blockCount != 0L) {
      val n = math.abs(blockCount)
      if (blockCount < 0) in.readLong() // block byte size (unused)
      var i = 0L
      while (i < n) {
        val key = in.readString()
        val value = in.readBytes()
        key match {
          case "avro.schema" => schemaJson = new String(value, UTF_8)
          case "avro.codec" => codec = new String(value, UTF_8)
          case _ => () // other metadata ignored
        }
        i += 1
      }
      blockCount = in.readLong()
    }
    require(schemaJson != null, "missing avro.schema")
    require(Set("null", "deflate", "snappy")(codec), s"unsupported codec $codec")
    val schema = parseSchema(schemaJson)
    val sync = in.take(16)
    val records = Vector.newBuilder[Seq[Any]]
    var blocks = 0L
    while (!in.eof) {
      val count = in.readLong()
      require(count >= 0, "negative block count")
      val size = in.readLong()
      require(size >= 0 && size <= Int.MaxValue, "bad block size")
      val payload = in.take(size.toInt)
      val raw = codec match {
        case "null" => payload
        case "deflate" => inflateRaw(payload)
        case "snappy" =>
          require(payload.length >= 4, "snappy block too short")
          val data = Snappy.uncompress(java.util.Arrays.copyOfRange(payload, 0, payload.length - 4))
          val crc = new java.util.zip.CRC32()
          crc.update(data)
          val stored = ((payload(payload.length - 4) & 0xffL) << 24) |
            ((payload(payload.length - 3) & 0xffL) << 16) |
            ((payload(payload.length - 2) & 0xffL) << 8) |
            (payload(payload.length - 1) & 0xffL)
          require(crc.getValue == stored, "snappy CRC mismatch")
          data
      }
      val body = new Reader(raw)
      var i = 0L
      while (i < count) { records += readDatum(body, schema).asInstanceOf[Seq[Any]]; i += 1 }
      require(body.eof, "block decodes short of its size")
      require(java.util.Arrays.equals(in.take(16), sync), "sync marker mismatch")
      blocks += 1
    }
    (schema, codec, records.result(), blocks)
  }

  private def readDatum(in: Reader, s: Schema): Any = s match {
    case SNull => null
    case SBoolean => in.u8() match {
      case 0 => false
      case 1 => true
      case b => throw new IllegalStateException(s"bad boolean byte $b")
    }
    case SInt => in.readLong().toInt
    case SLong => in.readLong()
    case SFloat =>
      var bits = 0
      var i = 0
      while (i < 4) { bits |= in.u8() << (8 * i); i += 1 }
      java.lang.Float.intBitsToFloat(bits)
    case SDouble =>
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (in.u8().toLong) << (8 * i); i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    case SString => in.readString()
    case SBytes => in.readBytes()
    case SRecord(_, fields) => fields.map { case (_, ft) => readDatum(in, ft) }
    case SArray(items) =>
      val out = Vector.newBuilder[Any]
      var n = in.readLong()
      while (n != 0L) {
        if (n < 0) { in.readLong(); n = -n } // negative count: byte size follows
        var i = 0L
        while (i < n) { out += readDatum(in, items); i += 1 }
        n = in.readLong()
      }
      out.result()
    case SMap(values) =>
      val out = Map.newBuilder[String, Any]
      var n = in.readLong()
      while (n != 0L) {
        if (n < 0) { in.readLong(); n = -n }
        var i = 0L
        while (i < n) { out += (in.readString() -> readDatum(in, values)); i += 1 }
        n = in.readLong()
      }
      out.result()
    case SUnion(branches) =>
      val idx = in.readLong()
      require(idx >= 0 && idx < branches.size, s"bad union index $idx")
      readDatum(in, branches(idx.toInt))
    case SEnum(_, symbols) =>
      val idx = in.readLong()
      require(idx >= 0 && idx < symbols.size, s"bad enum index $idx")
      symbols(idx.toInt)
    case SFixed(_, size) => in.take(size)
  }

  private def inflateRaw(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalStateException("deflate: truncated")
      out.write(buf, 0, n)
      if (out.size > (1 << 28)) throw new IllegalStateException("deflate: output too large")
    }
    inf.end()
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def eof: Boolean = pos >= bytes.length
    def u8(): Int = {
      if (pos >= bytes.length) throw new IllegalStateException("avro: truncated")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) throw new IllegalStateException("avro: truncated")
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; r
    }
    def readLong(): Long = {
      var v = 0L
      var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 63) throw new IllegalStateException("avro: varint overflow")
        b = u8()
      }
      v |= (b & 0x7fL) << shift
      (v >>> 1) ^ -(v & 1) // un-zigzag
    }
    def readString(): String = new String(readBytes(), UTF_8)
    def readBytes(): Array[Byte] = {
      val n = readLong()
      require(n >= 0 && n <= Int.MaxValue, "bad length")
      take(n.toInt)
    }
  }

}
