package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    (("the quick brown fox jumps over a lazy dog and then runs off to " +
      "the nearby hills with great speed before dusk ") * 3).trim // 66 words, stopwords present

  private def row(text: String) =
    GopherRules.signals(Seq((1L, text)).toDF("doc_id", "text")).collect().head

  test("a normal document passes every rule") {
    val r = row(goodText)
    assert(r.getAs[Boolean]("keep"), r.toString)
    assert(r.getAs[Long]("n_words") == 66L)
  }

  test("each rule trips on its targeted pathology") {
    assert(!row("too short").getAs[Boolean]("pass_words"))
    val bullets = goodText + "\n" + List.fill(30)("- item").mkString("\n")
    assert(!row(bullets).getAs[Boolean]("pass_bullet"))
    val ellipses = goodText + "\n" + List.fill(10)("to be continued...").mkString("\n")
    assert(!row(ellipses).getAs[Boolean]("pass_ellipsis"))
    val hashy = goodText + " " + List.fill(20)("#").mkString(" ")
    assert(!row(hashy).getAs[Boolean]("pass_symbol"))
    val numeric = (1 to 60).map(_.toString).mkString(" ")
    assert(!row(numeric).getAs[Boolean]("pass_alpha"))
    val noStop = List.fill(60)("zumba").mkString(" ")
    assert(!row(noStop).getAs[Boolean]("pass_stop"))
    val longWords = List.fill(60)("incomprehensibilities").mkString(" ")
    assert(!row(longWords).getAs[Boolean]("pass_mean_len"))
  }

  test("symbol counting: hashes, dot-runs and unicode ellipses, non-overlapping") {
    val r = row("a # b ... c …. d")
    // '#' ×1, '...' ×1 (the '....' contributes one 3-dot run + 1 leftover dot
    // which is NOT counted), '…' ×1
    assert(r.getAs[Long]("n_symbols") == 3L)
  }

  test("empty and degenerate docs fail closed, not with errors") {
    val r = row("")
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[Long]("n_words") == 0L && r.getAs[Long]("n_lines") == 1L)
    assert(!r.getAs[Boolean]("pass_mean_len") && !r.getAs[Boolean]("pass_alpha"))
  }

  test("repetition signals: top 2-gram mass, duplicated 5-gram mass, exact arithmetic") {
    val boiler = "buy now " * 10                        // "buy now" x10 + alternating "now buy" x9
    val varied = (1 to 30).map(i => f"w$i%02d").mkString(" ") // 30 unique 3-char words
    val df = Seq((1L, boiler.trim), (2L, varied), (3L, "one"), (4L, "")).toDF("doc_id", "text")
    val out = GopherRules.repetitionSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val r1 = out(1L)
    // 20 tokens, 19 2-grams: "buy now" x10, "now buy" x9 → top = "buy now" (7 chars x 10)
    assert(r1.getAs[String]("top_2gram") == "buy now")
    assert(r1.getAs[Long]("top2_count") == 10L && r1.getAs[Long]("top2_chars") == 70L)
    assert(r1.getAs[Long]("total_chars") == 79L)  // "buy now buy ..." joined length
    assert(!r1.getAs[Boolean]("pass_top2"))       // 70*5 > 79
    // 16 distinct 5-grams... all "buy now buy now buy"/"now buy..." repeat heavily
    assert(r1.getAs[Long]("dup5_chars") > 0L && !r1.getAs[Boolean]("pass_dup5"))

    val r2 = out(2L)
    assert(r2.getAs[Long]("top2_count") == 1L)    // all 2-grams unique
    assert(r2.getAs[Boolean]("pass_top2") && r2.getAs[Boolean]("pass_dup5"))
    assert(r2.getAs[Long]("dup5_chars") == 0L)

    // docs too short for grams fail nothing and produce empty/zero signals
    Seq(3L, 4L).foreach { i =>
      val r = out(i)
      assert(r.getAs[String]("top_2gram") == "" && r.getAs[Long]("top2_chars") == 0L)
      assert(r.getAs[Boolean]("pass_top2") && r.getAs[Boolean]("pass_dup5"))
    }
  }

  test("filterDocs keeps exactly the keep=true subset with original columns") {
    val docs = Seq((1L, goodText), (2L, "too short")).toDF("doc_id", "text")
    val kept = GopherRules.filterDocs(docs)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
