package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

/** TFRecord + tf.Example reader/writer in pure JVM — the framing
  * training pipelines actually feed models from. Two public layers:
  *
  * **TFRecord framing** (TensorFlow's record format): each record is
  * `u64le length | u32le masked-CRC32C(length bytes) | payload |
  * u32le masked-CRC32C(payload)`, where the mask is the rotate-and-
  * add `((crc >>> 15) | (crc << 17)) + 0xa282ead8` — the rotation
  * makes a CRC-of-CRC-bearing-bytes distinct from a data CRC. Both
  * CRCs are VERIFIED on read (JDK `CRC32C`, Castagnoli polynomial);
  * any mismatch or truncation ⇒ valid=false, never silence.
  *
  * **tf.Example protobuf** decoded by a hand-rolled wire-format
  * walk: `Example{features=1} → Features{map<string,Feature>=1} →
  * Feature{bytes_list=1|float_list=2|int64_list=3}`, with varint /
  * 64-bit / length-delimited / 32-bit wire types, map entries as
  * nested (key=1, value=2) messages, and repeated int64/float
  * accepted BOTH packed and unpacked (the protobuf spec requires
  * readers to accept either). Unknown fields are skipped by wire
  * type — forward-compatible the way real protobuf readers are.
  *
  * The record framing is why this scales: records are independent,
  * so a 100 TB corpus shards into files read in parallel with zero
  * coordination, and the kernel here runs map-only per payload.
  * TfRecordSpec pins hand-derived wire bytes, the public CRC32C
  * test vector, packed≡unpacked acceptance, and a malformed set.
  */
object TfRecord {

  sealed trait FeatureVal
  final case class BytesF(values: Vector[Array[Byte]]) extends FeatureVal
  final case class FloatF(values: Vector[Float]) extends FeatureVal
  final case class Int64F(values: Vector[Long]) extends FeatureVal

  type Example = Vector[(String, FeatureVal)] // insertion-ordered feature map

  final case class TfRecordInfo(nRecords: Long, nFeatures: Long, totalBytes: Long, valid: Boolean)

  // ---------------------------------------------------------------- crc

  /** TFRecord's masked CRC32C. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  // ---------------------------------------------------------------- write

  def encodeFile(examples: Seq[Example]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    examples.foreach { ex =>
      val payload = encodeExample(ex)
      val lenBytes = new Array[Byte](8)
      var v = payload.length.toLong
      var i = 0
      while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
      out.write(lenBytes)
      writeU32le(out, maskedCrc(lenBytes, 0, 8))
      out.write(payload)
      writeU32le(out, maskedCrc(payload, 0, payload.length))
    }
    out.toByteArray
  }

  def encodeExample(ex: Example): Array[Byte] = {
    val features = new java.io.ByteArrayOutputStream()
    ex.foreach { case (name, value) =>
      val entry = new java.io.ByteArrayOutputStream()
      val nameBytes = name.getBytes(UTF_8)
      writeKey(entry, 1, 2); writeVarint(entry, nameBytes.length.toLong); entry.write(nameBytes)
      val feature = encodeFeature(value)
      writeKey(entry, 2, 2); writeVarint(entry, feature.length.toLong); entry.write(feature)
      val eb = entry.toByteArray
      writeKey(features, 1, 2); writeVarint(features, eb.length.toLong); features.write(eb)
    }
    val fb = features.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    writeKey(out, 1, 2); writeVarint(out, fb.length.toLong); out.write(fb)
    out.toByteArray
  }

  private def encodeFeature(v: FeatureVal): Array[Byte] = {
    val list = new java.io.ByteArrayOutputStream()
    val fieldNo = v match {
      case BytesF(vs) =>
        vs.foreach { b => writeKey(list, 1, 2); writeVarint(list, b.length.toLong); list.write(b) }
        1
      case FloatF(vs) => // packed, the proto3 default for scalars
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach { f =>
          val bits = java.lang.Float.floatToIntBits(f)
          packed.write(bits & 0xff); packed.write((bits >> 8) & 0xff)
          packed.write((bits >> 16) & 0xff); packed.write((bits >> 24) & 0xff)
        }
        val pb = packed.toByteArray
        writeKey(list, 1, 2); writeVarint(list, pb.length.toLong); list.write(pb)
        2
      case Int64F(vs) =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        val pb = packed.toByteArray
        writeKey(list, 1, 2); writeVarint(list, pb.length.toLong); list.write(pb)
        3
    }
    val lb = list.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    writeKey(out, fieldNo, 2); writeVarint(out, lb.length.toLong); out.write(lb)
    out.toByteArray
  }

  private def writeKey(out: java.io.ByteArrayOutputStream, fieldNo: Int, wireType: Int): Unit =
    writeVarint(out, ((fieldNo << 3) | wireType).toLong)

  /** Plain (non-zigzag) protobuf varint — negatives take 10 bytes. */
  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeU32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  // ---------------------------------------------------------------- read

  def decode(bytes: Array[Byte]): TfRecordInfo =
    try {
      val exs = decodeUnsafe(bytes)
      TfRecordInfo(exs.size.toLong, exs.map(_.size.toLong).sum, bytes.length.toLong, valid = true)
    } catch { case _: Exception => TfRecordInfo(0L, 0L, 0L, valid = false) }

  def examples(bytes: Array[Byte]): Seq[Example] =
    try decodeUnsafe(bytes)
    catch { case _: Exception => Nil }

  private def decodeUnsafe(bytes: Array[Byte]): Seq[Example] = {
    val out = Vector.newBuilder[Example]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, "tfrecord: truncated header")
      var len = 0L
      var i = 0
      while (i < 8) { len |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      require(len >= 0 && len <= Int.MaxValue, "tfrecord: bad length")
      require(u32le(bytes, pos + 8) == maskedCrc(bytes, pos, 8), "tfrecord: length CRC mismatch")
      val dataOff = pos + 12
      require(dataOff + len + 4 <= bytes.length, "tfrecord: truncated record")
      require(u32le(bytes, dataOff + len.toInt) == maskedCrc(bytes, dataOff, len.toInt),
        "tfrecord: data CRC mismatch")
      out += parseExample(bytes, dataOff, len.toInt)
      pos = dataOff + len.toInt + 4
    }
    out.result()
  }

  private def u32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private final class Wire(bytes: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def eof: Boolean = pos >= end
    def u8(): Int = {
      if (pos >= end) throw new IllegalStateException("proto: truncated")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 63) throw new IllegalStateException("proto: varint overflow")
        b = u8()
      }
      v | ((b & 0x7fL) << shift)
    }
    def lenDelim(): (Int, Int) = {
      val n = varint()
      if (n < 0 || pos + n > end) throw new IllegalStateException("proto: bad length")
      val r = (pos, pos + n.toInt); pos += n.toInt; r
    }
    def fixed32(): Int = {
      val v = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24); v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => pos += 8; require(pos <= end, "proto: truncated fixed64")
      case 2 => lenDelim(); ()
      case 5 => pos += 4; require(pos <= end, "proto: truncated fixed32")
      case t => throw new IllegalStateException(s"proto: unsupported wire type $t")
    }
  }

  private def parseExample(bytes: Array[Byte], off: Int, len: Int): Example = {
    val w = new Wire(bytes, off, off + len)
    var features: Example = Vector.empty
    while (!w.eof) {
      val key = w.varint()
      val (field, wt) = ((key >>> 3).toInt, (key & 7).toInt)
      if (field == 1 && wt == 2) {
        val (s, e) = w.lenDelim()
        features = features ++ parseFeatures(bytes, s, e)
      } else w.skip(wt)
    }
    features
  }

  private def parseFeatures(bytes: Array[Byte], off: Int, end: Int): Example = {
    val w = new Wire(bytes, off, end)
    val out = Vector.newBuilder[(String, FeatureVal)]
    while (!w.eof) {
      val key = w.varint()
      val (field, wt) = ((key >>> 3).toInt, (key & 7).toInt)
      if (field == 1 && wt == 2) { // one map entry
        val (s, e) = w.lenDelim()
        val entry = new Wire(bytes, s, e)
        var name: String = null
        var value: FeatureVal = null
        while (!entry.eof) {
          val ek = entry.varint()
          val (ef, ewt) = ((ek >>> 3).toInt, (ek & 7).toInt)
          if (ef == 1 && ewt == 2) {
            val (ns, ne) = entry.lenDelim()
            name = new String(bytes, ns, ne - ns, UTF_8)
          } else if (ef == 2 && ewt == 2) {
            val (vs, ve) = entry.lenDelim()
            value = parseFeature(bytes, vs, ve)
          } else entry.skip(ewt)
        }
        require(name != null, "proto: map entry without key")
        out += (name -> (if (value == null) Int64F(Vector.empty) else value))
      } else w.skip(wt)
    }
    out.result()
  }

  private def parseFeature(bytes: Array[Byte], off: Int, end: Int): FeatureVal = {
    val w = new Wire(bytes, off, end)
    var result: FeatureVal = Int64F(Vector.empty)
    while (!w.eof) {
      val key = w.varint()
      val (field, wt) = ((key >>> 3).toInt, (key & 7).toInt)
      require(wt == 2, s"proto: feature kind with wire type $wt")
      val (s, e) = w.lenDelim()
      field match {
        case 1 => // BytesList
          val inner = new Wire(bytes, s, e)
          val vs = Vector.newBuilder[Array[Byte]]
          while (!inner.eof) {
            val ik = inner.varint()
            if (((ik >>> 3).toInt, (ik & 7).toInt) == ((1, 2))) {
              val (bs, be) = inner.lenDelim()
              vs += java.util.Arrays.copyOfRange(bytes, bs, be)
            } else inner.skip((ik & 7).toInt)
          }
          result = BytesF(vs.result())
        case 2 => // FloatList: packed or unpacked
          val inner = new Wire(bytes, s, e)
          val vs = Vector.newBuilder[Float]
          while (!inner.eof) {
            val ik = inner.varint()
            ((ik >>> 3).toInt, (ik & 7).toInt) match {
              case (1, 2) => // packed run
                val (ps, pe) = inner.lenDelim()
                require((pe - ps) % 4 == 0, "proto: packed float length")
                val p = new Wire(bytes, ps, pe)
                while (!p.eof) vs += java.lang.Float.intBitsToFloat(p.fixed32())
              case (1, 5) => vs += java.lang.Float.intBitsToFloat(inner.fixed32())
              case (_, t) => inner.skip(t)
            }
          }
          result = FloatF(vs.result())
        case 3 => // Int64List: packed or unpacked
          val inner = new Wire(bytes, s, e)
          val vs = Vector.newBuilder[Long]
          while (!inner.eof) {
            val ik = inner.varint()
            ((ik >>> 3).toInt, (ik & 7).toInt) match {
              case (1, 2) =>
                val (ps, pe) = inner.lenDelim()
                val p = new Wire(bytes, ps, pe)
                while (!p.eof) vs += p.varint()
              case (1, 0) => vs += inner.varint()
              case (_, t) => inner.skip(t)
            }
          }
          result = Int64F(vs.result())
        case _ => () // unknown kind: skip
      }
    }
    result
  }
}
