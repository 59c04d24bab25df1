package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** WARC reader/writer — record walk, HTTP payload parse, gzip-member
  * layout equivalence, and the malformed contract.
  */
class WarcSpec extends AnyFunSuite {
  import Warc.WarcRecord

  private def archive(body: String, status: Int = 200,
                      uri: String = "http://x.test/a"): Seq[WarcRecord] = Seq(
    WarcRecord("warcinfo", "", 0, "", "software: graft"),
    WarcRecord("request", uri, 0, "", ""),
    WarcRecord("response", uri, status, "text/html", body))

  test("plain archive: counts, status, uri and body stats") {
    val info = Warc.decode(Warc.encode(archive("<html>hi</html>"), gzip = false))
    assert(info.valid)
    assert(info.nRecords === 3L)
    assert(info.nResponses === 1L)
    assert(info.status === 200)
    assert(info.uri === "http://x.test/a")
    assert(info.bodyChars === "<html>hi</html>".length.toLong)
  }

  test("gzip member layout decodes identically to the plain archive") {
    val recs = archive("gzip me " * 50, status = 404)
    val plain = Warc.decode(Warc.encode(recs, gzip = false))
    val gz = Warc.decode(Warc.encode(recs, gzip = true))
    assert(plain === gz)
    assert(gz.status === 404)
  }

  test("multiple responses concatenate bodies; first response wins status/uri") {
    val recs = archive("first", 200, "http://x.test/1") ++
      Seq(WarcRecord("response", "http://x.test/2", 500, "text/html", "second"))
    val info = Warc.decode(Warc.encode(recs, gzip = true))
    assert(info.nRecords === 4L && info.nResponses === 2L)
    assert(info.status === 200 && info.uri === "http://x.test/1")
    assert(info.bodyChars === ("first".length + "second".length).toLong)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("firstsecond".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(info.bodyMd5 === md5)
  }

  test("unicode bodies: chars counted as characters, md5 over UTF-8 bytes") {
    val info = Warc.decode(Warc.encode(archive("héllo wörld"), gzip = false))
    assert(info.valid)
    assert(info.bodyChars === "héllo wörld".length.toLong)
  }

  test("malformed payloads yield valid=false, never exceptions") {
    assert(!Warc.decode(null).valid)
    assert(!Warc.decode(Array.emptyByteArray).valid)
    assert(!Warc.decode("HTTP/1.1 200 OK\r\n\r\n".getBytes).valid)
    assert(!Warc.decode("WARC/1.0\r\nbroken".getBytes).valid)
    val good = Warc.encode(archive("truncate me please, thanks"), gzip = false)
    for (cut <- Seq(5, 40, good.length / 2, good.length - 2))
      assert(!Warc.decode(java.util.Arrays.copyOf(good, cut)).valid, s"cut at $cut")
    // declared content length beyond the record
    val lied = new String(good, "ISO-8859-1").replaceFirst("Content-Length: ", "Content-Length: 9")
    assert(!Warc.decode(lied.getBytes("ISO-8859-1")).valid)
  }
}
