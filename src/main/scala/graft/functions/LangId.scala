package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification from character n-gram evidence —
  * the standard cheap langid for corpus pre-filtering (profiles after
  * Cavnar & Trenkle's n-gram categorization; profiles here are small
  * built-in lists of high-frequency word/character markers).
  *
  * Pure column expressions: the per-language score is the count of
  * profile n-grams present in the doc plus a weighted hit count of
  * marker words, computed with array_intersect against literal
  * arrays — map-only, codegen-friendly, no shuffle.
  */
object LangId {

  /** (language → (marker words, marker char-trigrams)). */
  val Profiles: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("en", Seq("the", "and", "of", "to", "is", "with", "that", "for"),
      Seq("th", "he", "in", "er", "an")),
    ("es", Seq("el", "la", "de", "que", "los", "una", "por", "con"),
      Seq("de", "en", "os", "la", "ar")),
    ("de", Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
      Seq("en", "er", "ch", "de", "ei")),
    ("fr", Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
      Seq("es", "le", "de", "re", "en")),
    ("zh", Seq("的", "是", "不", "了", "在", "人", "有", "我"),
      Seq("的", "是", "不", "了", "在")))

  private def score(text: Column, words: Seq[String], grams: Seq[String]): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val wordHits = size(filter(toks, t => t.isin(words: _*)))
    val bigrams = TextFunctions.charShingles(text, 2)
    val gramHits = size(array_intersect(bigrams, array(grams.map(lit): _*)))
    wordHits * 3 + gramHits
  }

  /** Struct column (lang, score): argmax over language profiles. */
  def detect(text: Column): Column = {
    val scored = Profiles.map { case (lang, words, grams) =>
      struct(score(text, words, grams).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct: lexicographic (score, lang) — deterministic
    // tiebreak by language code.
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"), best.getField("score").as("score"))
  }
}
