package graft.functions

import graft.SparkSpec

/** Blocklist — Aho-Corasick automaton vs naive indexOf stepping
  * (the oracle's string_split semantics), nested/self-overlapping
  * patterns, the annotate aggregates, and partition invariance.
  */
class BlocklistSpec extends SparkSpec {

  /** The reference semantics: non-overlapping left-to-right counts,
    * one pattern at a time — what DuckDB's string_split counts.
    */
  private def naive(text: String, p: String): Long = {
    var i = text.indexOf(p); var c = 0L
    while (i >= 0) { c += 1; i = text.indexOf(p, i + p.length) }
    c
  }

  test("hand cases: self-overlap collapses greedily, nesting counts both") {
    val a = new Blocklist.Automaton(Seq("aa", "table scan", "scan"))
    assert(a.nonOverlapCounts("aaaa").toSeq === Seq(2L, 0L, 0L)) // not 3
    assert(a.nonOverlapCounts("aaa").toSeq === Seq(1L, 0L, 0L))
    // "scan" matches inside "table scan": patterns are independent
    assert(a.nonOverlapCounts("a table scan here").toSeq === Seq(0L, 1L, 1L))
    assert(a.nonOverlapCounts("").toSeq === Seq(0L, 0L, 0L))
  }

  test("automaton counts equal indexOf stepping on random dense text") {
    val pats = Seq("ab", "aba", "ba", "aab", "b", "abab", "a a", "ba b")
    val auto = new Blocklist.Automaton(pats)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val t = (0 until (1 + rnd.nextInt(60)))
        .map(_ => "ab "(rnd.nextInt(3))).mkString
      val got = auto.nonOverlapCounts(t).toSeq
      val want = pats.map(naive(t, _))
      assert(got === want, s"text='$t'")
    }
  }

  test("default pattern list counts match on real corpus text") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(50).collect()
    val auto = new Blocklist.Automaton(Blocklist.defaultPatterns)
    docs.foreach { r =>
      val t = r.getString(1).toLowerCase(java.util.Locale.ROOT)
      val got = auto.nonOverlapCounts(t).toSeq
      val want = Blocklist.defaultPatterns.map(naive(t, _))
      assert(got === want, s"doc ${r.getLong(0)}")
    }
  }

  test("annotate aggregates and tie-break; partition invariance") {
    import spark.implicits._
    val df = Seq(
      (1L, "zz xx zz yy"),  // zz:2 xx:1 yy:1 -> top zz
      (2L, "xx yy"),        // tie at 1 -> lexicographically smallest: xx
      (3L, "nothing here"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val pats = Seq("zz", "xx", "yy")
    def run(d: org.apache.spark.sql.DataFrame) =
      Blocklist.annotate(d, "doc_id", "text", pats)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
    val got = run(df)
    assert(got === Seq(
      (1L, 4L, 3L, "zz"),
      (2L, 2L, 2L, "xx"),
      (3L, 0L, 0L, ""),
      (4L, 0L, 0L, "")))
    assert(run(df.repartition(5)) === got)
  }
}
