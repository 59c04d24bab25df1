package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", App. A1.1 — the de-facto standard pre-training corpus
  * filter set, also the backbone of C4/RefinedWeb-style cleaning):
  * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  * bullet-line and ellipsis-line fractions, alphabetic-word fraction,
  * and a minimum distinct-stopword requirement, combined into one
  * keep/drop verdict.
  *
  * Complements q21's scalar quality score: that ranks, this GATES —
  * the reference pipeline has no corpus-level gate at all (it trusts
  * per-menu LLM extraction), so this is part of the mandated
  * training-data surface.
  *
  * All signals are INTEGER counts and every threshold is evaluated in
  * cross-multiplied integer space (e.g. mean word length ∈ [3,10] ⇔
  * 3·n ≤ Σlen ≤ 10·n), so the whole record is exact and
  * engine-portable — no double ever reaches the output.
  *
  * Scale: pure map-side column expressions over the document scan —
  * no shuffle, no UDF, fully codegen'd; at 100 TB this rides the scan
  * for free like the rest of the annotation pass.
  */
object GopherRules {

  /** Gopher's stopword set; a document must contain at least
    * `minStopwords` distinct members to pass.
    */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinWords = 50L
  val MaxWords = 100000L
  val MinStopwords = 2L

  /** Append the signal + verdict columns to `df`. Signals:
    * n_words, n_lines, n_alpha (words containing a letter),
    * n_symbols (# chars + "..." runs + "…"), n_bullet / n_ellipsis
    * (lines starting with a bullet / ending with an ellipsis),
    * n_stop (distinct stopwords present); verdicts: one pass_* per
    * rule plus the combined `keep`.
    */
  def signals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = TextFunctions.tokens(t)
    val ltoks = TextFunctions.tokens(lower(t))
    val lines = split(t, "\n")

    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, x) => a + length(x).cast("long"))
    val nAlpha = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val nEllipsis = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    def removed(lit0: String): Column =
      length(t) - length(call_function("replace", t, lit(lit0), lit("")))
    val nSymbols = (removed("#") + (removed("...") / 3).cast("long") + removed("…")).cast("long")
    val nStop = size(array_intersect(array_distinct(ltoks), typedLit(Stopwords))).cast("long")

    df.withColumn("n_words", nWords)
      .withColumn("n_lines", nLines)
      .withColumn("n_alpha", nAlpha)
      .withColumn("n_symbols", nSymbols)
      .withColumn("n_bullet", nBullet)
      .withColumn("n_ellipsis", nEllipsis)
      .withColumn("n_stop", nStop)
      .withColumn("pass_words", col("n_words").between(MinWords, MaxWords))
      .withColumn("pass_mean_len",
        col("n_words") > 0 && sumLen >= col("n_words") * 3 && sumLen <= col("n_words") * 10)
      .withColumn("pass_symbol", col("n_words") > 0 && col("n_symbols") * 10 <= col("n_words"))
      .withColumn("pass_bullet", col("n_bullet") * 10 <= col("n_lines") * 9)
      .withColumn("pass_ellipsis", col("n_ellipsis") * 10 <= col("n_lines") * 3)
      .withColumn("pass_alpha", col("n_words") > 0 && col("n_alpha") * 5 >= col("n_words") * 4)
      .withColumn("pass_stop", col("n_stop") >= MinStopwords)
      .withColumn("keep",
        col("pass_words") && col("pass_mean_len") && col("pass_symbol") &&
          col("pass_bullet") && col("pass_ellipsis") && col("pass_alpha") && col("pass_stop"))
  }

  /** The gate itself: documents surviving every rule. */
  def filterDocs(df: DataFrame, textCol: String = "text"): DataFrame =
    signals(df, textCol).filter(col("keep"))
      .drop("n_words", "n_lines", "n_alpha", "n_symbols", "n_bullet", "n_ellipsis",
        "n_stop", "pass_words", "pass_mean_len", "pass_symbol", "pass_bullet",
        "pass_ellipsis", "pass_alpha", "pass_stop", "keep")
}
