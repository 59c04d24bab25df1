package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-derived unigram language-model scoring — the "perplexity
  * proxy" quality signal (CCNet-style filtering uses an external KenLM;
  * with no model available the corpus's own unigram distribution is
  * the standard stand-in): documents whose tokens are corpus-rare get
  * a high average negative log-probability and can be gated or
  * bucketed for curriculum mixing.
  *
  * One tokenize pass, all derived: the corpus is exploded and
  * aggregated to (doc, token, k) ONCE; the vocabulary is a
  * re-aggregation of that table (sum k per token) and the corpus
  * total a re-aggregation of the vocabulary — every branch hangs off
  * the same (doc,token) shuffle, so Spark's ReuseExchange rule
  * executes the explode+partial-agg once however many branches
  * consume it (a naive explode-per-branch plan tokenizes the corpus
  * three times). Joining (doc,token,k) instead of raw exploded
  * tokens also shrinks the join input from total-token to
  * distinct-(doc,token) scale, and the hot-token join skew is
  * AQE-split.
  *
  * Integer evidence columns (n_toks, sum_cnt, min_cnt, n_hapax) are
  * exact and engine-portable — the driver oracle checks those; the
  * double `avg_neg_logp` involves ln() whose last ulp is libm-specific
  * (same tradeoff as TfIdf's ln weight), so it is spec-checked.
  */
object UnigramLm {

  /** (doc, token, k): distinct-pair-scale counts — the one tokenize
    * pass everything else re-aggregates. The explicit isNotNull on
    * the id matters for PLAN REUSE, not semantics (null-id docs score
    * null anyway via the final left join): the downstream left join
    * infers isnotnull(id) and pushes it into the per-doc branch only,
    * which would make the three branches' exchange subtrees
    * canonically different and defeat ReuseExchange — pinning the
    * filter here keeps every branch byte-identical up to this
    * aggregation, so the corpus is exploded once, not once per
    * branch.
    */
  private def docTokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("k"))

  /** Vocabulary pass: (token, cnt) over lowercased whitespace tokens. */
  def counts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docTokenCounts(docs, idCol, textCol)
      .groupBy("token").agg(sum(col("k")).as("cnt"))

  /** Per-document score against the corpus unigram distribution:
    * n_toks, sum_cnt (Σ corpus count with multiplicity), min_cnt
    * (rarest token's corpus count), n_hapax (tokens occurring exactly
    * once corpus-wide), and avg_neg_logp = ln(N) − (1/n)·Σ ln(cnt_t)
    * — the mean −ln p(t) under the corpus unigram model (lower =
    * more "typical" text; null for token-less docs).
    */
  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docTok = docTokenCounts(docs, idCol, textCol)
    val vocab = counts(docs, idCol, textCol) // same exchange as docTok → reused
    // Σ cnt == Σ token-count per doc: the scalar needs no explode and
    // no shuffle — a map-side sum folds to one row
    val total = docs.filter(col(idCol).isNotNull)
      .agg(sum(size(TextFunctions.tokens(lower(col(textCol))))).as("total_toks"))
    val perDoc = docTok.join(vocab, Seq("token"))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_toks"),
        sum(col("k") * col("cnt")).as("sum_cnt"),
        min(col("cnt")).as("min_cnt"),
        sum(when(col("cnt") === 1L, col("k")).otherwise(0L)).as("n_hapax"),
        sum(col("k").cast("double") * log(col("cnt").cast("double"))).as("_sum_ln"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left").crossJoin(broadcast(total))
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("sum_cnt"), lit(0L)).as("sum_cnt"),
        coalesce(col("min_cnt"), lit(0L)).as("min_cnt"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        when(col("n_toks").isNull, lit(null).cast("double"))
          .otherwise(log(col("total_toks").cast("double")) - col("_sum_ln") / col("n_toks").cast("double"))
          .as("avg_neg_logp"))
  }
}
