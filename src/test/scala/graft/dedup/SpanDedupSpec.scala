package graft.dedup

import graft.SparkSpec

/** SpanDedup — cross-doc shared spans, interval union, edge cases. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = 5

  private def stats(docs: Seq[(Long, String)]) =
    SpanDedup.spanStats(docs.toDF("doc_id", "text"), "doc_id", "text", w = W)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a shared W-token run is flagged in both docs with exact coverage") {
    val shared = (1 to W).map(i => s"shared$i").mkString(" ")
    val v = stats(Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared"),
      (3L, "totally different words here indeed truly")))
    // exactly one W-window matches in each doc → island of 1 window,
    // coverage = W tokens
    assert(v(1L).getAs[Long]("n_dup_windows") === 1L)
    assert(v(1L).getAs[Long]("dup_tokens") === W.toLong)
    assert(v(2L).getAs[Long]("dup_tokens") === W.toLong)
    assert(v(1L).getAs[Boolean]("has_dup_span"))
    assert(!v(3L).getAs[Boolean]("has_dup_span"))
    assert(v(3L).getAs[Long]("n_dup_windows") === 0L)
  }

  test("a longer shared run unions overlapping windows, not double-counts") {
    val run = (1 to W + 3).map(i => s"r$i").mkString(" ") // W+3 tokens → 4 windows
    val v = stats(Seq(
      (1L, s"x1 x2 $run y1 y2"),
      (2L, run)))
    // 4 overlapping flagged windows merge into ONE island covering W+3
    assert(v(1L).getAs[Long]("n_dup_windows") === 4L)
    assert(v(1L).getAs[Long]("dup_tokens") === (W + 3).toLong)
    assert(v(2L).getAs[Long]("dup_tokens") === (W + 3).toLong)
  }

  test("two disjoint shared spans form separate islands whose coverage adds") {
    val runA = (1 to W).map(i => s"a$i").mkString(" ")
    val runB = (1 to W).map(i => s"b$i").mkString(" ")
    val gap = (1 to W + 2).map(i => s"g$i").mkString(" ") // > w gap between spans
    val v = stats(Seq(
      (1L, s"$runA $gap $runB"),
      (2L, runA),
      (3L, runB)))
    assert(v(1L).getAs[Long]("n_dup_windows") === 2L)
    assert(v(1L).getAs[Long]("dup_tokens") === 2L * W)
  }

  test("a window repeated only WITHIN one doc is not a cross-doc dup") {
    val run = (1 to W).map(i => s"w$i").mkString(" ")
    val v = stats(Seq(
      (1L, s"$run filler1 filler2 filler3 filler4 filler5 $run"),
      (2L, "other tokens entirely distinct from that")))
    assert(!v(1L).getAs[Boolean]("has_dup_span"),
      "within-doc repetition is q58's class, not span dedup's")
  }

  private def removed(docs: Seq[(Long, String)]) =
    SpanDedup.removeSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w = W)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("removal keeps exactly one occurrence corpus-wide (min-id doc)") {
    val shared = (1 to W).map(i => s"sh$i").mkString(" ")
    val v = removed(Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"one two $shared three"),
      (3L, s"x y $shared z")))
    // doc 1 is the keeper: loses nothing; docs 2 and 3 each lose W tokens
    assert(v(1L).getAs[Long]("n_removed_tokens") === 0L)
    assert(v(1L).getAs[String]("cleaned_text") === s"alpha beta $shared gamma")
    assert(v(2L).getAs[Long]("n_removed_tokens") === W.toLong)
    assert(v(2L).getAs[String]("cleaned_text") === "one two three")
    assert(v(3L).getAs[String]("cleaned_text") === "x y z")
  }

  test("removal cuts the full interval union, not per-window repeats") {
    val run = (1 to W + 2).map(i => s"r$i").mkString(" ") // 3 overlapping windows
    val v = removed(Seq(
      (1L, run),                      // keeper
      (2L, s"pre1 pre2 $run post1"))) // loses the whole W+2 run once
    assert(v(2L).getAs[Long]("n_removed_tokens") === (W + 2).toLong)
    assert(v(2L).getAs[String]("cleaned_text") === "pre1 pre2 post1")
    assert(v(1L).getAs[Long]("n_removed_tokens") === 0L)
  }

  test("docs without duplicated spans pass through untouched (lowercased rejoin)") {
    val v = removed(Seq(
      (1L, "Just Some Unique words here"),
      (2L, "")))
    assert(v(1L).getAs[Long]("n_removed_tokens") === 0L)
    assert(v(1L).getAs[String]("cleaned_text") === "just some unique words here")
    assert(v(2L).getAs[Long]("n_tokens") === 0L)
    assert(v(2L).getAs[String]("cleaned_text") === "")
  }

  test("short and empty docs yield zero windows and zeroed stats") {
    val v = stats(Seq(
      (1L, "only three tokens"),
      (2L, ""),
      (3L, (1 to W).map(i => s"z$i").mkString(" "))))
    assert(v(1L).getAs[Long]("n_windows") === 0L)
    assert(v(2L).getAs[Long]("n_tokens") === 0L)
    assert(v(2L).getAs[Long]("n_windows") === 0L)
    assert(v(3L).getAs[Long]("n_windows") === 1L)
    assert(!v(2L).getAs[Boolean]("has_dup_span"))
  }
}
