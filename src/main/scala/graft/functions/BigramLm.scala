package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-derived BIGRAM language-model scoring — the conditional-
  * probability upgrade of [[UnigramLm]]'s perplexity proxy (CCNet
  * gates on an external KenLM n-gram model; with no model shipped,
  * the corpus's own bigram statistics are the standard stand-in):
  * p(w2|w1) = c(w1 w2) / c(w1 ·), so word-salad text whose ADJACENT
  * pairs are corpus-rare scores badly even when every individual
  * token is common — the signal unigram scoring is blind to.
  *
  * Scale shape (and why it differs from q60): the scoring join is
  * keyed on the BIGRAM (w1, w2). The bigram vocabulary grows with
  * the corpus (quadratic-ish in the unigram vocab at 100 TB), so
  * unlike a unigram table it can NEVER be broadcast — this is the
  * canonical shuffle-join-only LM shape. Everything is arranged to
  * keep that one shuffle cheap: doc bigrams collapse to
  * distinct-(doc, w1, w2) counts BEFORE the join (map-side partial
  * aggregation; raw adjacent-pair streams never shuffle), the
  * context totals c(w1 ·) are a vocab-scale re-aggregation of the
  * bigram table ATTACHED to the bigram table first (vocab-scale
  * join) so the corpus-scale join happens exactly once, and hot-head
  * bigram skew ("of the", "in the") is AQE-split.
  *
  * Integer evidence columns (n_bigrams, sum_cnt, min_cnt, n_hapax,
  * sum_ctx) are exact and engine-portable — the q95 oracle checks
  * those; the double `avg_neg_logp` = (1/n)·Σ k·(ln c(w1·) −
  * ln c(w1 w2)) involves ln() whose last ulp is libm-specific (the
  * q60 / TfIdf tradeoff), so it is spec-checked.
  */
object BigramLm {

  private def tokensOf(textCol: Column): Column =
    TextFunctions.tokens(lower(textCol))

  /** (doc, w1, w2, k): distinct doc-bigram counts — the one explode
    * pass everything else re-aggregates. Docs with < 2 tokens yield
    * no rows (they score null downstream).
    *
    * The isNotNull pins on w1/w2 matter for PLAN REUSE, not
    * semantics (tokens are never null): the downstream joins infer
    * isnotnull(w1, w2) on the pair-keyed branches but only
    * isnotnull(w1) on the context branch, which would make the three
    * branches' exchange subtrees canonically different and defeat
    * AQE stage reuse — pinning both here keeps every branch
    * byte-identical up to this aggregation, so the corpus is
    * exploded once, not once per branch (UnigramLm's documented
    * shape).
    */
  def docBigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), tokensOf(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("k"))

  /** Corpus bigram table (w1, w2, cnt) — distinct-pair scale. */
  def counts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docBigramCounts(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(sum(col("k")).as("cnt"))

  /** Per-document score against the corpus bigram model: n_bigrams,
    * sum_cnt (Σ k·c(w1 w2)), min_cnt (rarest bigram's corpus count),
    * n_hapax (bigram occurrences whose pair is corpus-unique),
    * sum_ctx (Σ k·c(w1 ·) — the conditional denominators), and
    * avg_neg_logp = mean −ln p(w2|w1) (null for docs with < 2
    * tokens; lower = more "typical" adjacency structure).
    */
  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docBg = docBigramCounts(docs, idCol, textCol)
    val bg = docBg.groupBy("w1", "w2").agg(sum(col("k")).as("cnt")) // literally shared subtree
    val ctx = bg.groupBy("w1").agg(sum(col("cnt")).as("ctx"))
    // context totals attach at bigram-vocab scale so the corpus-scale
    // (w1, w2) join happens exactly once
    val model = bg.join(ctx, Seq("w1"))
    val perDoc = docBg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("cnt")).as("sum_cnt"),
        min(col("cnt")).as("min_cnt"),
        sum(when(col("cnt") === 1L, col("k")).otherwise(0L)).as("n_hapax"),
        sum(col("k") * col("ctx")).as("sum_ctx"),
        sum(col("k").cast("double") *
          (log(col("ctx").cast("double")) - log(col("cnt").cast("double"))))
          .as("_sum_ln"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_cnt"), lit(0L)).as("sum_cnt"),
        coalesce(col("min_cnt"), lit(0L)).as("min_cnt"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        coalesce(col("sum_ctx"), lit(0L)).as("sum_ctx"),
        (col("_sum_ln") / col("n_bigrams").cast("double")).as("avg_neg_logp"))
  }
}
