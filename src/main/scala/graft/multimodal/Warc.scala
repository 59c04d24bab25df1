package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500) reader + writer — the container
  * format web crawls actually arrive in (Common-Crawl-style), and the
  * ingestion front door a training-data pipeline needs before any
  * text operator can see a byte: a crawl corpus is not a parquet
  * column of clean strings, it is millions of multi-record archives
  * of HTTP traffic.
  *
  * Writer: WARC/1.0 records (warcinfo / request / response) with
  * correct Content-Length framing and the standard `.warc.gz` layout
  * — EACH record its own gzip member, so a scale reader can split
  * archives at member boundaries. Reader: walks records (header
  * block → Content-Length payload → CRLF CRLF separator), parses the
  * HTTP status line + headers out of response records, and folds
  * per-archive statistics plus the concatenated response bodies.
  * Multi-member gzip decodes through the JDK's native concatenated-
  * member support; malformed payloads yield `valid=false` rows,
  * never exceptions (the crawl-scale contract).
  *
  * Reference anchor: the reference routes files by extension to
  * per-format extractors (`universal_extractor.py`); WARC is the
  * batch container those files arrive inside at crawl scale.
  */
object Warc {

  final case class WarcRecord(recordType: String, targetUri: String,
                              httpStatus: Int, contentType: String, body: String)

  final case class WarcInfo(
      nRecords: Long, nResponses: Long, status: Int,
      uri: String, bodyChars: Long, bodyMd5: String, valid: Boolean)

  private val InvalidInfo = WarcInfo(0L, 0L, 0, "", 0L, "", valid = false)

  private def crlf(sb: StringBuilder): StringBuilder = sb.append("\r\n")

  /** Serialize one record (uncompressed). */
  private def recordBytes(r: WarcRecord, date: String): Array[Byte] = {
    val payload: Array[Byte] = r.recordType match {
      case "response" =>
        val sb = new StringBuilder
        crlf(sb.append(s"HTTP/1.1 ${r.httpStatus} OK"))
        crlf(sb.append(s"Content-Type: ${r.contentType}"))
        crlf(sb)
        sb.append(r.body)
        sb.toString.getBytes(UTF_8)
      case "request" =>
        s"GET ${r.targetUri} HTTP/1.1\r\nHost: crawl\r\n\r\n".getBytes(UTF_8)
      case _ => r.body.getBytes(UTF_8)
    }
    val h = new StringBuilder
    crlf(h.append("WARC/1.0"))
    crlf(h.append(s"WARC-Type: ${r.recordType}"))
    crlf(h.append(s"WARC-Date: $date"))
    if (r.targetUri.nonEmpty) crlf(h.append(s"WARC-Target-URI: ${r.targetUri}"))
    crlf(h.append(s"Content-Length: ${payload.length}"))
    crlf(h)
    val head = h.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Serialize an archive; `gzip = true` produces the standard
    * `.warc.gz` layout (one gzip member per record).
    */
  def encode(records: Seq[WarcRecord], gzip: Boolean,
             date: String = "2024-01-01T00:00:00Z"): Array[Byte] = {
    if (!gzip) records.map(recordBytes(_, date)).foldLeft(Array.emptyByteArray)(_ ++ _)
    else {
      val out = new ByteArrayOutputStream()
      records.foreach { r =>
        val gz = new GZIPOutputStream(out)
        gz.write(recordBytes(r, date))
        gz.finish()
      }
      out.toByteArray
    }
  }

  /** Parse an archive into statistics over its response records:
    * record counts, the FIRST response's status + target URI, and the
    * md5 / char count of the concatenation of all response bodies.
    */
  def decode(bytes: Array[Byte]): WarcInfo = {
    try decodeUnsafe(bytes)
    catch { case _: Exception => InvalidInfo }
  }

  final case class WarcResponse(uri: String, status: Int, body: String)

  /** Extract every response record's (uri, status, body) — the
    * per-document ingestion face (`decode` is the stats face); an
    * empty result means the archive is malformed or response-free.
    */
  def responses(bytes: Array[Byte]): Seq[WarcResponse] = {
    try { val (_, rs) = walk(bytes); rs }
    catch { case _: Exception => Nil }
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def decodeUnsafe(raw: Array[Byte]): WarcInfo = {
    val (nRecords, rs) = walk(raw)
    if (nRecords == 0L) return InvalidInfo
    val bodyBytes = rs.map(_.body.getBytes(UTF_8)).foldLeft(Array.emptyByteArray)(_ ++ _)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bodyBytes)
      .map(b => f"${b & 0xff}%02x").mkString
    val bodyStr = new String(bodyBytes, UTF_8)
    WarcInfo(nRecords, rs.length.toLong,
      rs.headOption.map(_.status).getOrElse(0),
      rs.headOption.map(_.uri).getOrElse(""),
      bodyStr.codePointCount(0, bodyStr.length).toLong, md5, valid = true)
  }

  /** The record walk both faces share; throws on malformation. */
  private def walk(raw: Array[Byte]): (Long, Seq[WarcResponse]) = {
    if (raw == null || raw.length < 10) throw new IllegalStateException("too short")
    val bytes =
      if ((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) gunzipAll(raw) else raw
    var pos = 0
    var nRecords = 0L
    val rs = Seq.newBuilder[WarcResponse]
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= bytes.length) throw new IllegalStateException("unterminated line")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val version = line()
      if (!version.startsWith("WARC/")) throw new IllegalStateException(s"bad version: $version")
      var recordType = ""
      var uri = ""
      var contentLength = -1L
      var hdr = line()
      while (hdr.nonEmpty) {
        val i = hdr.indexOf(':')
        if (i < 0) throw new IllegalStateException("malformed header")
        val k = hdr.substring(0, i).trim.toLowerCase
        val v = hdr.substring(i + 1).trim
        k match {
          case "warc-type" => recordType = v
          case "warc-target-uri" => uri = v
          case "content-length" => contentLength = v.toLong
          case _ => ()
        }
        hdr = line()
      }
      if (contentLength < 0 || pos + contentLength + 4 > bytes.length)
        throw new IllegalStateException("bad content length")
      if (recordType == "response") {
        // HTTP payload: status line + headers, blank line, body
        val p0 = pos
        val status = {
          val sl = line()
          val parts = sl.split(" ")
          if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
            throw new IllegalStateException(s"bad status line: $sl")
          parts(1).toInt
        }
        var h = line()
        while (h.nonEmpty) h = line()
        val bodyLen = (p0 + contentLength - pos).toInt
        if (bodyLen < 0) throw new IllegalStateException("http headers exceed record")
        rs += WarcResponse(uri, status, new String(bytes, pos, bodyLen, UTF_8))
        pos += bodyLen
      } else {
        pos += contentLength.toInt
      }
      if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
        throw new IllegalStateException("missing record separator")
      pos += 4
      nRecords += 1
    }
    (nRecords, rs.result())
  }
}
