package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt evaluator — RFC 9309 group selection, wildcard/$ rule
  * matching, longest-pattern precedence with Allow winning ties, and
  * the tolerant-parse contract.
  */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# crawl policy
      |User-agent: *
      |Disallow: /private
      |Allow: /private/open
      |Disallow: /*.tmp$
      |Allow: /
      |
      |User-agent: graftbot
      |User-agent: graftbot-images
      |Disallow: /
      |Allow: /docs
      |Crawl-delay: 5
      |Sitemap: http://x.test/sitemap.xml
      |""".stripMargin

  private val rs = Robots.parse(txt)

  private def allowed(agent: String, path: String): Boolean = rs.evaluate(agent, path)._1

  test("longest pattern wins; Allow wins length ties") {
    assert(allowed("anybot", "/public/page"))
    assert(!allowed("anybot", "/private/secret"), "/private (8) beats / (1)")
    assert(allowed("anybot", "/private/open/x"), "/private/open (13) beats /private (8)")
  }

  test("wildcard and $ anchor rules") {
    assert(!allowed("anybot", "/cache/f1.tmp"), "/*.tmp$ matches at end")
    assert(allowed("anybot", "/cache/f1.tmpx"), "$ anchor must not match mid-path")
    assert(!allowed("anybot", "/a/b/c.tmp"), "* spans path segments")
  }

  test("group selection: longest agent token, * fallback, shared agent lines") {
    assert(!allowed("graftbot", "/anything"), "specific group Disallow: /")
    assert(allowed("graftbot", "/docs/guide"), "specific group Allow: /docs")
    assert(!allowed("graftbot-images", "/pics"), "second shared User-agent line")
    assert(allowed("otherbot", "/public/page"), "fallback to * group")
  }

  test("no applicable group or no matching rule allows") {
    val only = Robots.parse("User-agent: special\nDisallow: /\n")
    assert(only.evaluate("anybot", "/x") === ((true, "")))
    assert(!only.evaluate("specialbot", "/x")._1, "token prefix selects the group")
  }

  test("tolerant parse: comments, junk lines, empty disallow, null") {
    val messy = Robots.parse(
      "junk line without colon\nUser-agent: *\nDisallow:\nAllow: /a # inline comment\nnonsense: x\n")
    assert(messy.evaluate("bot", "/a/b") === ((true, "/a")))
    assert(messy.evaluate("bot", "/zzz")._1, "empty Disallow matches nothing")
    assert(Robots.parse(null).evaluate("bot", "/x") === ((true, "")))
    assert(Robots.parse("").evaluate("bot", "/x") === ((true, "")))
  }

  test("matched pattern is reported for audit") {
    assert(rs.evaluate("anybot", "/private/zz") === ((false, "/private")))
    assert(rs.evaluate("anybot", "/private/open/f") === ((true, "/private/open")))
    assert(rs.evaluate("anybot", "/cache/x.tmp") === ((false, "/*.tmp$")))
  }
}
