package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** UrlFunctions — field extraction, registered-domain heuristic, and
  * canonicalization, including the malformed-input contract (empty
  * fields, never an error).
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def fields(url: String): (String, String, String, String, Long, String) = {
    val r = Seq(url).toDF("u").select(
      UrlFunctions.scheme(col("u")).as("scheme"),
      UrlFunctions.host(col("u")).as("host"),
      UrlFunctions.path(col("u")).as("path"),
      UrlFunctions.registeredDomain(col("u")).as("rd"),
      UrlFunctions.pathDepth(col("u")).as("depth"),
      UrlFunctions.canonicalize(col("u")).as("canon")).head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4), r.getString(5))
  }

  test("plain https URL with tracking params and fragment") {
    val (scheme, host, path, rd, depth, canon) =
      fields("https://WWW.Example.com/a/b/page1?utm_source=x&id=7&utm_campaign=y#frag")
    assert(scheme === "https")
    assert(host === "www.example.com")
    assert(path === "/a/b/page1")
    assert(rd === "example.com")
    assert(depth === 3L)
    assert(canon === "https://www.example.com/a/b/page1?id=7")
  }

  test("userinfo and port are excluded from host") {
    val (_, host, path, rd, _, canon) =
      fields("https://user:pw@media.example.org:8080/v/9?gclid=zz")
    assert(host === "media.example.org")
    assert(path === "/v/9")
    assert(rd === "example.org")
    assert(canon === "https://media.example.org/v/9") // gclid stripped, '?' dropped
  }

  test("multi-part TLD keeps three labels") {
    val (_, _, _, rd, _, _) = fields("http://blog.example.co.uk/post/1")
    assert(rd === "example.co.uk")
    val (_, _, _, rd2, _, _) = fields("http://example.co.uk/")
    assert(rd2 === "example.co.uk")
    // two-label host that merely ends in a registry label stays as-is
    val (_, _, _, rd3, _, _) = fields("http://foo.gov/x")
    assert(rd3 === "foo.gov")
  }

  test("bare host and empty path") {
    val (scheme, host, path, rd, depth, canon) = fields("ftp://files.example.net")
    assert(scheme === "ftp")
    assert(host === "files.example.net")
    assert(path === "")
    assert(rd === "example.net")
    assert(depth === 0L)
    assert(canon === "ftp://files.example.net")
  }

  test("malformed URLs yield empty fields, never errors") {
    for (junk <- Seq("not a url 42", "", "   ", "http//missing.colon/x", "://")) {
      val (scheme, host, path, rd, depth, _) = fields(junk)
      assert(scheme === "", junk)
      assert(host === "", junk)
      assert(path === "", junk)
      assert(rd === "", junk)
      assert(depth === 0L, junk)
    }
  }

  test("ref and fbclid tracking params are stripped; non-tracking survive in order") {
    val (_, _, _, _, _, canon) =
      fields("https://a.example.com/p?ref=nav&x=1&fbclid=k&y=2")
    assert(canon === "https://a.example.com/p?x=1&y=2")
  }

  test("anchorHrefs: every href in document order, attrs before href, none missed") {
    val html = """<html><body><a href="https://x.com/1">a</a>""" +
      """<a class="c" id="i" href="/rel">b</a><a>no-href</a>""" +
      """<p href="https://not-an-anchor.com">p</p>""" +
      """<a href="mailto:u@x.com">m</a><a href="">empty</a></body></html>"""
    val got = Seq(html).toDF("h")
      .select(UrlFunctions.anchorHrefs(col("h")).as("hrefs"))
      .head().getSeq[String](0)
    assert(got === Seq("https://x.com/1", "/rel", "mailto:u@x.com", ""))
  }
}
