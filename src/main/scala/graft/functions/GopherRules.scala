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

  /** Gopher's REPETITION rules (App. A1.1 second family): the
    * fraction of characters taken by the single most common word
    * 2-gram (threshold 0.20) and by all duplicated word 5-grams
    * (threshold 0.30). Char mass of a gram = occurrences × gram
    * length (its tokens + internal spaces) — a documented
    * deterministic realization of "characters contained in" that
    * avoids span-union bookkeeping; total chars = length of the
    * space-joined token stream. Ties for the top gram break
    * lexicographically. All arithmetic is integer; thresholds are
    * cross-multiplied.
    *
    * Shape: two explode → (id, gram) groupBy passes (the same
    * corpus-wide tokenize shuffle class as TF-IDF) joined back per
    * doc — never a per-doc quadratic HOF scan, so a boilerplate-heavy
    * 100 TB corpus costs two shuffles of (id, gram-hash) width.
    */
  def repetitionSignals(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    // NOT cached: three consumers (two gram explodes + the final join)
    // each re-run the map-side tokenize instead. Caching the exploded
    // token arrays would pin a corpus-sized table (larger than the
    // text itself) per call — and this is called per bench iteration /
    // per micro-batch, where leaked caches accumulate. A 3× regex
    // re-scan is the cheaper trade at any scale.
    val base = df.select(id, TextFunctions.tokens(col(textCol)).as("_toks"))
      .withColumn("total_chars",
        aggregate(col("_toks"), lit(0L), (a, x) => a + length(x).cast("long")) +
          greatest(size(col("_toks")).cast("long") - 1L, lit(0L)))

    def gramRows(n: Int): DataFrame = base.select(id,
      explode(when(size(col("_toks")) >= n,
        transform(sequence(lit(0), size(col("_toks")) - n),
          i => array_join(slice(col("_toks"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("cnt").desc, col("gram"))
    val top2 = gramRows(2)
      .groupBy(id, col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(id, col("gram").as("top_2gram"),
        col("cnt").as("top2_count"),
        (col("cnt") * length(col("gram"))).cast("long").as("top2_chars"))
    val dup5 = gramRows(5)
      .groupBy(id, col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .groupBy(id)
      .agg(sum(col("cnt") * length(col("gram"))).cast("long").as("dup5_chars"))

    base.select(id, col("total_chars"))
      .join(top2, Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(id, col("total_chars"),
        coalesce(col("top_2gram"), lit("")).as("top_2gram"),
        coalesce(col("top2_count"), lit(0L)).as("top2_count"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup5_chars"), lit(0L)).as("dup5_chars"))
      .withColumn("pass_top2", col("top2_chars") * 5 <= col("total_chars"))
      .withColumn("pass_dup5", col("dup5_chars") * 10 <= col("total_chars") * 3)
  }

  /** The gate itself: documents surviving every rule. */
  def filterDocs(df: DataFrame, textCol: String = "text"): DataFrame =
    signals(df, textCol).filter(col("keep"))
      .drop("n_words", "n_lines", "n_alpha", "n_symbols", "n_bullet", "n_ellipsis",
        "n_stop", "pass_words", "pass_mean_len", "pass_symbol", "pass_bullet",
        "pass_ellipsis", "pass_alpha", "pass_stop", "keep")
}
