package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("lines frequent across docs are stripped; rare repeats and unique lines survive") {
    // 12 docs: a shared banner + footer (12 docs each ≥ 10), a line
    // shared by only 5 docs (below threshold), and a unique line.
    val docs = (1L to 12L).map { i =>
      val rare = if (i <= 5) "\nrare promo" else ""
      (i, s"COOKIE BANNER\nunique line $i$rare\nfooter")
    }.toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(docs, minDocs = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d1 = out(1L)
    assert(d1.getAs[Long]("n_lines") == 4L && d1.getAs[Long]("n_kept") == 2L)
    assert(d1.getAs[String]("cleaned_md5") == md5Hex("unique line 1\nrare promo"))
    val d7 = out(7L)
    assert(d7.getAs[Long]("n_kept") == 1L)
    assert(d7.getAs[String]("cleaned_md5") == md5Hex("unique line 7"))
  }

  test("a document made entirely of boilerplate cleans to the empty string") {
    val docs = ((1L to 11L).map(i => (i, s"spam line\nother $i")) :+ (99L, "spam line"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(docs, minDocs = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d99 = out(99L)
    assert(d99.getAs[Long]("n_lines") == 1L && d99.getAs[Long]("n_kept") == 0L)
    assert(d99.getAs[String]("cleaned_md5") == md5Hex(""))
  }

  test("order of surviving lines is preserved") {
    val docs = ((1L to 10L).map(i => (i, "junk")) :+
      (42L, "junk\nb\na\njunk\nc")).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(docs, minDocs = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(42L).getAs[String]("cleaned_md5") == md5Hex("b\na\nc"))
  }
}
