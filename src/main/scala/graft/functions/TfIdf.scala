package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF over a tokenized corpus — the standard relevance weighting
  * for corpus analytics / keyword extraction.
  *
  * Scale shape: one explode of tokens (map-side), a (doc, token)
  * count aggregate, a token-level document-frequency aggregate
  * (narrow: one row per distinct token), and a broadcast-friendly
  * join of the tiny DF table back onto the term table. The corpus
  * text itself never shuffles — only (token, ids, counts).
  *
  * idf = ln((N + 1) / (df + 1)) (smoothed); tfidf = tf * idf with
  * tf = term count / doc token count, computed with mirrored
  * divisions so a SQL twin reproduces the doubles bit-exactly.
  */
object TfIdf {

  /** (idCol, token, tf, df, tfidf) for every (doc, token) pair. */
  def compute(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val nDocs = docs.select(col(idCol)).distinct().count()

    val terms = docs
      .select(col(idCol), explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val termCounts = terms.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n_term"))
    val docLens = termCounts.groupBy(col(idCol))
      .agg(sum(col("n_term")).as("n_doc_tokens"))
    val docFreq = termCounts.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))

    termCounts
      .join(docLens, Seq(idCol))
      .join(broadcast(docFreq), Seq("token"))
      .withColumn("tf", col("n_term").cast("double") / col("n_doc_tokens").cast("double"))
      .withColumn("idf", log(lit(nDocs + 1.0) / (col("df").cast("double") + 1.0)))
      .withColumn("tfidf", col("tf") * col("idf"))
      .select(col(idCol), col("token"), col("n_term"), col("df"), col("tf"), col("tfidf"))
  }
}
