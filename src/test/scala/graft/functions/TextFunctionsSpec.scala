package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("token counts: whitespace vs regex") {
    assert(one[Int](TextFunctions.tokenCount(col("t")), "a  b\tc") == 3)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "") == 0)
    // "don't stop" → [don][']​[t][stop] = 4 regex tokens
    assert(one[Int](TextFunctions.regexTokenCount(col("t")), "don't stop") == 4)
  }

  test("ratios and quality bounds") {
    assert(one[Double](TextFunctions.stopwordRatio(col("t")), "the cat and a dog") == 0.6)
    assert(one[Double](TextFunctions.meanTokenLen(col("t")), "ab cdef") == 3.0)
    assert(one[Double](TextFunctions.punctRatio(col("t")), "a,b!") == 0.5)
    val q = one[Double](TextFunctions.qualityScoreRaw(col("t")),
      "the quick brown fox jumps over a lazy dog near the riverbank today")
    assert(q > 0.0 && q <= 1.0)
  }

  test("fingerprints stable under whitespace/case noise") {
    val a = one[String](TextFunctions.fingerprintMd5(col("t")), "Hello   World")
    val b = one[String](TextFunctions.fingerprintMd5(col("t")), "  hello world ")
    assert(a == b)
    val ra = one[Long](TextFunctions.fingerprintRolling(col("t")), "Hello   World")
    val rb = one[Long](TextFunctions.fingerprintRolling(col("t")), "  hello world ")
    assert(ra == rb && ra > 0)
  }

  test("shingles and jaccard") {
    assert(one[scala.collection.Seq[String]](TextFunctions.charShingles(col("t"), 3), "abcd").toSeq == Seq("abc", "bcd"))
    assert(one[scala.collection.Seq[String]](TextFunctions.charShingles(col("t"), 3), "ab").toSeq == Seq())
    assert(one[scala.collection.Seq[String]](TextFunctions.wordShingles(col("t"), 2), "a b c").toSeq == Seq("a b", "b c"))
    val j = Seq(("abcd", "abce")).toDF("x", "y")
      .select(TextFunctions.jaccard(
        TextFunctions.charShingles(col("x"), 3),
        TextFunctions.charShingles(col("y"), 3)).as("j"))
      .as[Double].head()
    assert(j == 1.0 / 3.0) // {abc,bcd} vs {abc,bce}: 1 shared of 3
  }

  test("langid picks the right profile on real text") {
    val det = Seq(
      ("en", "the cat sat on the mat with that friend of mine"),
      ("es", "el perro de la casa que corre por los campos con una bola"),
      ("de", "der hund und die katze sind nicht mit einem ball"),
      ("fr", "le chien est dans les jardins pour une promenade des amis"),
      ("zh", "我 是 一个 人 他 不 是 在 的 了")
    ).toDF("expected", "t")
      .select(col("expected"), LangId.detect(col("t")).getField("lang").as("got"))
      .as[(String, String)].collect()
    det.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("PII redaction: URL/email/phone replaced; nested email counts as URL") {
    val t = "Write to bob.smith+x@mail.co or https://a.io/u?e=x@y.com call +1-555-0199 now"
    val red = one[String](TextFunctions.redactPii(col("t")), t)
    assert(red == "Write to <EMAIL> or <URL> call <PHONE> now")
    val counts = Seq(t).toDF("t")
      .select(TextFunctions.piiCounts(col("t")): _*).collect().head
    assert(counts.getAs[Long]("n_url") == 1L)
    assert(counts.getAs[Long]("n_email") == 1L) // the one inside the URL is gone
    assert(counts.getAs[Long]("n_phone") == 1L)
  }

  test("intra-doc line dedup keeps first occurrences in order") {
    val t = "header\nline a\nline b\nheader\nline a\nline c\nheader"
    assert(one[String](TextFunctions.dedupLines(col("t")), t) ==
      "header\nline a\nline b\nline c")
    assert(math.abs(one[Double](TextFunctions.dupLineFraction(col("t")), t) - 3.0 / 7.0) < 1e-12)
    assert(one[String](TextFunctions.dedupLines(col("t")), "solo") == "solo")
    assert(one[Double](TextFunctions.dupLineFraction(col("t")), "a\nb\nc") == 0.0)
  }

  test("stripMarkup: script/style vanish wholesale, blocks become lines, entities decode") {
    val html = "<html><head><title>T</title><style>p{color:red}</style></head><body>" +
      "<script>if (1 < 2 && 3 > 2) { alert('x'); }</script>" +
      "<h1>Head</h1><p>one &amp; two</p><div>A &lt;3 B</div>" +
      "<ul><li>x</li><li>y</li></ul><br></body></html>"
    val clean = one[String](TextFunctions.stripMarkup(col("t")), html)
    // script content (including its < > operators) is gone entirely
    assert(!clean.contains("alert") && !clean.contains("color"))
    // </title> is not a block closer, so title text shares the first
    // line; each listed closer (</h1> </p> </div> </li>) breaks one
    assert(clean == "T Head\none & two\nA <3 B\nx\ny")
  }

  test("stripMarkup: double-encoded entities are not over-decoded (&amp; decodes last)") {
    // &amp;lt; is the TEXT "&lt;", not a less-than sign
    assert(one[String](TextFunctions.stripMarkup(col("t")), "<p>&amp;lt;tag&amp;gt;</p>") ==
      "&lt;tag&gt;")
  }

  test("markupTitle: first title contents; empty when absent") {
    assert(one[String](TextFunctions.markupTitle(col("t")),
      "<head><TITLE lang=\"en\">My Page</TITLE><title>other</title></head>") == "My Page")
    assert(one[String](TextFunctions.markupTitle(col("t")), "<p>no title</p>") == "")
  }
}
