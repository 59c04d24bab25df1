package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP container reader + writer (PKWARE APPNOTE layout) — the other
  * batch container crawl corpora arrive in next to WARC: document
  * dumps, dataset releases, and site exports are ZIP files of mixed
  * entries. The reader is a REAL central-directory walk, not a
  * ZipInputStream wrapper, because that is the scale-correct access
  * path: the central directory sits at END of file, so a distributed
  * reader lists entries and random-accesses only the ones it needs —
  * streaming the local headers front-to-back (what ZipInputStream
  * does) cannot skip and cannot trust sizes when data descriptors are
  * in play.
  *
  * Surface: EOCD scan (comment-tolerant) → central directory entries
  * (name, method, sizes, CRC-32, local offset) → per-entry local
  * header parse (its OWN extra-field length — the spec allows it to
  * differ from the central one) → payload copy (stored) or raw
  * inflate (deflate, JDK Inflater nowrap) → CRC-32 VERIFIED against
  * the central record. Writer produces both methods. Malformed
  * payloads (truncation, lying sizes, bad magics, CRC mismatch)
  * yield `valid=false`, never exceptions; ZipSpec cross-checks the
  * JDK's own zip streams in BOTH directions.
  */
object Zip {

  final case class ZipEntrySpec(name: String, content: Array[Byte], deflate: Boolean)

  final case class ZipInfo(
      nEntries: Long, nDeflated: Long, totalBytes: Long,
      namesMd5: String, contentMd5: String, valid: Boolean)

  private val InvalidInfo = ZipInfo(0L, 0L, 0L, "", "", valid = false)

  // ---------------------------------------------------------------- write

  def encode(entries: Seq[ZipEntrySpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val centrals = Seq.newBuilder[Array[Byte]]
    entries.foreach { e =>
      val offset = out.size()
      val crc = new CRC32(); crc.update(e.content)
      val (method, data) =
        if (e.deflate) {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(e.content); d.finish()
          val buf = new Array[Byte](e.content.length + 64)
          val bos = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          (8, bos.toByteArray)
        } else (0, e.content)
      val name = e.name.getBytes(UTF_8)
      val lh = ByteBuffer.allocate(30 + name.length).order(ByteOrder.LITTLE_ENDIAN)
      lh.putInt(0x04034b50).putShort(20).putShort(0).putShort(method.toShort)
        .putShort(0).putShort(0) // time, date
        .putInt(crc.getValue.toInt).putInt(data.length).putInt(e.content.length)
        .putShort(name.length.toShort).putShort(0)
        .put(name)
      out.write(lh.array())
      out.write(data)
      val cd = ByteBuffer.allocate(46 + name.length).order(ByteOrder.LITTLE_ENDIAN)
      cd.putInt(0x02014b50).putShort(20).putShort(20).putShort(0).putShort(method.toShort)
        .putShort(0).putShort(0)
        .putInt(crc.getValue.toInt).putInt(data.length).putInt(e.content.length)
        .putShort(name.length.toShort).putShort(0).putShort(0)
        .putShort(0).putShort(0).putInt(0)
        .putInt(offset)
        .put(name)
      centrals += cd.array()
    }
    val cdStart = out.size()
    centrals.result().foreach(out.write)
    val cdSize = out.size() - cdStart
    val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    eocd.putInt(0x06054b50).putShort(0).putShort(0)
      .putShort(entries.length.toShort).putShort(entries.length.toShort)
      .putInt(cdSize).putInt(cdStart).putShort(0)
    out.write(eocd.array())
    out.toByteArray
  }

  // ---------------------------------------------------------------- read

  def decode(bytes: Array[Byte]): ZipInfo = {
    try {
      val es = entriesUnsafe(bytes)
      val nameMd = java.security.MessageDigest.getInstance("MD5")
      val contentMd = java.security.MessageDigest.getInstance("MD5")
      es.foreach { case (name, content, _) =>
        nameMd.update(name.getBytes(UTF_8)); contentMd.update(content)
      }
      ZipInfo(es.length.toLong, es.count(_._3 == 8).toLong,
        es.map(_._2.length.toLong).sum,
        nameMd.digest().map(b => f"${b & 0xff}%02x").mkString,
        contentMd.digest().map(b => f"${b & 0xff}%02x").mkString, valid = true)
    } catch { case _: Exception => InvalidInfo }
  }

  /** Extract every entry's (name, content) — the per-entry ingestion
    * face (`decode` is the stats face); empty ⇒ malformed or empty.
    */
  def entries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    try entriesUnsafe(bytes).map(e => (e._1, e._2))
    catch { case _: Exception => Nil }
  }

  /** (name, content, method) per entry; throws on malformation. */
  private def entriesUnsafe(bytes: Array[Byte]): Seq[(String, Array[Byte], Int)] = {
    if (bytes == null || bytes.length < 22) throw new IllegalStateException("too short")
    // EOCD: scan backwards (a trailing comment may follow it)
    var eocd = -1
    var i = bytes.length - 22
    while (i >= 0 && eocd < 0) {
      if (bytes(i) == 0x50 && bytes(i + 1) == 0x4b && bytes(i + 2) == 0x05 && bytes(i + 3) == 0x06)
        eocd = i
      i -= 1
    }
    if (eocd < 0) throw new IllegalStateException("no EOCD")
    val eb = ByteBuffer.wrap(bytes, eocd, bytes.length - eocd).order(ByteOrder.LITTLE_ENDIAN)
    eb.getInt // magic
    eb.getShort; eb.getShort // disk numbers
    eb.getShort // entries this disk
    val nEntries = eb.getShort & 0xffff
    eb.getInt // cd size
    val cdStart = eb.getInt
    if (cdStart < 0 || cdStart > eocd) throw new IllegalStateException("bad cd offset")

    val result = Seq.newBuilder[(String, Array[Byte], Int)]
    var pos = cdStart
    var k = 0
    while (k < nEntries) {
      val cb = ByteBuffer.wrap(bytes, pos, bytes.length - pos).order(ByteOrder.LITTLE_ENDIAN)
      if (cb.getInt != 0x02014b50) throw new IllegalStateException("bad central header")
      cb.getShort; cb.getShort; cb.getShort
      val method = cb.getShort & 0xffff
      cb.getShort; cb.getShort
      val crcExpected = cb.getInt
      val compSize = cb.getInt
      val uncompSize = cb.getInt
      val nameLen = cb.getShort & 0xffff
      val extraLen = cb.getShort & 0xffff
      val commentLen = cb.getShort & 0xffff
      cb.getShort; cb.getShort; cb.getInt
      val localOff = cb.getInt
      val name = new String(bytes, pos + 46, nameLen, UTF_8)
      if (method != 0 && method != 8) throw new IllegalStateException(s"method $method")
      if (compSize < 0 || uncompSize < 0) throw new IllegalStateException("negative size")

      // local header: its own name/extra lengths (may differ from central)
      val lb = ByteBuffer.wrap(bytes, localOff, bytes.length - localOff).order(ByteOrder.LITTLE_ENDIAN)
      if (lb.getInt != 0x04034b50) throw new IllegalStateException("bad local header")
      lb.getShort; lb.getShort; lb.getShort; lb.getShort; lb.getShort
      lb.getInt; lb.getInt; lb.getInt
      val lNameLen = lb.getShort & 0xffff
      val lExtraLen = lb.getShort & 0xffff
      val dataOff = localOff + 30 + lNameLen + lExtraLen
      if (dataOff + compSize > bytes.length) throw new IllegalStateException("data out of range")

      val content: Array[Byte] =
        if (method == 0) {
          if (compSize != uncompSize) throw new IllegalStateException("stored size mismatch")
          java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + compSize)
        } else {
          val inf = new Inflater(true)
          inf.setInput(bytes, dataOff, compSize)
          val outBuf = new Array[Byte](uncompSize)
          var got = 0
          while (got < uncompSize && !inf.finished()) {
            val n = inf.inflate(outBuf, got, uncompSize - got)
            if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated deflate")
            got += n
          }
          val done = got
          inf.end()
          if (done != uncompSize) throw new IllegalStateException("inflate size mismatch")
          outBuf
        }
      val crc = new CRC32(); crc.update(content)
      if (crc.getValue.toInt != crcExpected) throw new IllegalStateException("crc mismatch")
      result += ((name, content, method))
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    result.result()
  }
}
