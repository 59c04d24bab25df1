package graft.functions

import graft.SparkSpec

/** distinct-n diversity — hand-counted fixtures, the short-doc edge
  * (no bigrams from a 1-token doc), and the templated-slice contrast
  * the metric exists to expose.
  */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: (String, String)*) =
    Diversity.distinctNgrams(rows.toDF("grp", "text"), "grp", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("hand-counted distinct-1/distinct-2 on a tiny slice") {
    // tokens: a b a b c  → total_1=5, distinct_1=4 (a,b,c... a,b,a,b,c → {a,b,c}=3)
    val m = table("x" -> "a b a b c")
    val (t1, d1, bp1, t2, d2, bp2) = m("x")
    assert((t1, d1) === (5L, 3L))
    assert(bp1 === 3L * 10000 / 5)
    // bigrams: "a b","b a","a b","b c" → total 4, distinct 3
    assert((t2, d2) === (4L, 3L))
    assert(bp2 === 3L * 10000 / 4)
  }

  test("single-token docs contribute unigrams but no bigrams") {
    val m = table("x" -> "hello", "x" -> "hello world")
    val (t1, d1, _, t2, d2, _) = m("x")
    assert((t1, d1) === (3L, 2L))
    assert((t2, d2) === (1L, 1L))
  }

  test("a templated slice collapses distinct-2 while a diverse one holds") {
    val tmpl = (1 to 30).map(_ => "s" -> "buy cheap widgets online today")
    val div = (1 to 30).map(i => "d" -> s"tok${2 * i} tok${2 * i + 1} tok${7 * i % 61}")
    val m = table(tmpl ++ div: _*)
    assert(m("s")._6 < 1000, "templated slice must show collapsed distinct-2")
    assert(m("d")._6 > 9000, "diverse slice must keep distinct-2 high")
  }

  test("a bigram-free slice surfaces with total_2 = 0 and NULL d2_bp, not dropped") {
    // every doc in slice "solo" has one token → no bigrams anywhere in
    // the slice; it must still appear in the report (r15 ADVICE)
    val rows = Diversity.distinctNgrams(
      Seq("solo" -> "one", "solo" -> "two", "pair" -> "a b")
        .toDF("grp", "text"), "grp", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.contains("solo"), "bigram-free slice must not vanish")
    val solo = rows("solo")
    assert(solo.getLong(1) === 2L && solo.getLong(2) === 2L)
    assert(solo.getLong(4) === 0L && solo.getLong(5) === 0L,
      "total_2/distinct_2 report 0 for a bigram-free slice")
    assert(solo.isNullAt(6), "d2_bp is NULL (undefined), not 0")
    assert(rows("pair").getLong(4) === 1L)
  }
}
