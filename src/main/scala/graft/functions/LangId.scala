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

  private def score(toks: Column, bigrams: Column, words: Seq[String], grams: Seq[String]): Column = {
    val wordHits = size(filter(toks, t => t.isin(words: _*)))
    val gramHits = size(array_intersect(bigrams, array(grams.map(lit): _*)))
    wordHits * 3 + gramHits
  }

  private def best(toks: Column, bigrams: Column): Column =
    // bind (toks, bigrams) once so even raw-expression callers pay one
    // tokenize/shingle pass, not one per language profile
    element_at(transform(array(struct(toks.as("t"), bigrams.as("b"))), tb => {
      val scored = Profiles.map { case (lang, words, grams) =>
        struct(score(tb.getField("t"), tb.getField("b"), words, grams).as("score"),
          lit(lang).as("lang"))
      }
      // array_max on struct: lexicographic (score, lang) — deterministic
      // tiebreak by language code.
      val b = array_max(array(scored: _*))
      struct(b.getField("lang").as("lang"), b.getField("score").as("score"))
    }), 1)

  /** Struct column (lang, score): argmax over language profiles.
    * Convenience form — for corpus passes use `detected(df, textCol)`,
    * which materializes the token/bigram arrays once instead of
    * re-deriving them inside every profile's lambda.
    */
  def detect(text: Column): Column =
    best(TextFunctions.tokens(lower(text)), TextFunctions.charShingles(text, 2))

  /** df plus a `lang_detect` struct column (lang, score), computed
    * from materialized intermediates (one tokenize + one shingle pass
    * per row regardless of profile count).
    */
  def detected(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("_ltoks", TextFunctions.tokens(lower(col(textCol))))
      .withColumn("_norm2", TextFunctions.normalized(col(textCol)))
      .withColumn("_bigrams", TextFunctions.charShinglesOfNorm(col("_norm2"), 2))
      .withColumn("lang_detect", best(col("_ltoks"), col("_bigrams")))
      .drop("_ltoks", "_norm2", "_bigrams")
}
