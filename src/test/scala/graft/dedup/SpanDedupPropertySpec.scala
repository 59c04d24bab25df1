package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based robustness for the span operators (fixed-seed raw
  * ScalaCheck, one Spark job per property): arbitrary garbage text —
  * unicode soup, control chars, absurd whitespace — must never throw
  * and must keep the interval-union invariants.
  */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val garbage: Gen[String] = Gen.oneOf(
    Gen.alphaStr,
    Gen.listOf(Gen.oneOf("tok", "\u03bb", "\u6f22\u5b57", "$$", " ", "a b", "\t\n", "\u2026", "x"))
      .map(_.mkString(" ")),
    Gen.const(""),
    Gen.const("   \t  \n "),
    Gen.listOfN(40, Gen.oneOf("dup", "run", "tok")).map(_.mkString(" ")))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => garbage.apply(Gen.Parameters.default, Seed(i.toLong)).toSeq)

  test("spanStats invariants hold on garbage corpora") {
    val docs = samples(200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", w = 4).collect()
    assert(out.length === 200, "one row per doc, always")
    out.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nWin = r.getAs[Long]("n_windows")
      val nDup = r.getAs[Long]("n_dup_windows")
      val cov = r.getAs[Long]("dup_tokens")
      assert(nWin === math.max(nTok - 3, 0L), "window count formula")
      assert(nDup >= 0 && nDup <= nWin, "flagged windows bounded by windows")
      assert(cov >= 0 && cov <= nTok, "coverage bounded by tokens")
      assert((nDup > 0) === r.getAs[Boolean]("has_dup_span"))
      if (nDup > 0) assert(cov >= 4, "any flagged window covers at least w tokens")
    }
  }

  test("removeSpans invariants hold on garbage corpora") {
    val docs = samples(200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val stats = SpanDedup.spanStats(docs, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val out = SpanDedup.removeSpans(docs, "doc_id", "text", w = 4).collect()
    assert(out.length === 200)
    var removedTotal = 0L
    out.foreach { r =>
      val id = r.getLong(0)
      val nTok = r.getAs[Long]("n_tokens")
      val nRem = r.getAs[Long]("n_removed_tokens")
      val cleaned = r.getAs[String]("cleaned_text")
      assert(nRem >= 0 && nRem <= nTok, "cannot remove more than the doc holds")
      assert(nRem <= stats(id).getAs[Long]("dup_tokens"),
        "removal only cuts from detected duplicated mass")
      assert(cleaned != null && !cleaned.contains("  "), "single-space rejoin")
      removedTotal += nRem
    }
    // the generator plants identical 'dup run tok' docs, so removal
    // must actually fire somewhere
    assert(removedTotal > 0, "fuzz corpus contains planted duplicates")
  }
}
