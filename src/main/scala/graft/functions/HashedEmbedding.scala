package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic DOCUMENT EMBEDDINGS via signed feature hashing
  * (Weinberger, Dasgupta, Langford, Smola & Attenberg, "Feature
  * Hashing for Large Scale Multitask Learning", ICML 2009 — the
  * "hashing trick"): every token maps to a bucket of a FIXED
  * dim-dimensional space through the portable md5 fold, with a
  * hash-derived ±1 sign making collisions cancel in expectation
  * (the property that makes the estimator unbiased), and the
  * document's vector is the signed bag sum — an all-integer,
  * order-free projection that any engine reproduces bit-for-bit.
  *
  * This closes the reference's embedding step ENGINE-SIDE: the
  * reference calls an external embedding service
  * (BetterVersion/azure_openai_embedder.py); a neural encoder cannot
  * ship in this container, but the hashing-trick embedding is the
  * published classical replacement for exactly the similarity /
  * dedup / retrieval roles the vectors serve downstream — and unlike
  * the fixture `embeddings` table, it is DERIVED from the corpus, so
  * the whole text → vector → ANN chain runs self-contained (q215
  * retrieves over these; swap in any learned encoder's vectors
  * without changing a plan).
  *
  * Scale shape: one explode + one (doc, bucket) aggregate + one
  * per-doc map assembly — two keyed exchanges with map-side
  * partials, nothing wider than (id, bucket, count) ever shuffles,
  * and the output row is O(dim) however long the document.
  *
  * Numeric bounds: |v[i]| ≤ doc token count and norm2 ≤ (token
  * count)² — longs are safe past billion-token documents.
  */
object HashedEmbedding {

  /** md5 fold of a token: first 8 hex chars as a long in [0, 2^32). */
  private def fold(token: Column): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long")

  /** (idCol, embedding array<long> of length dim, norm2) — the signed
    * hashed bag-of-words vector over lowercased whitespace tokens.
    * Docs with zero tokens get the zero vector (norm2 = 0).
    */
  def embed(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    val toks = df.select(col(idCol),
      explode_outer(TextFunctions.tokens(lower(col(textCol)))).as("_t"))
    val h = fold(col("_t"))
    val signed = toks.select(col(idCol),
      when(col("_t").isNull, lit(null).cast("long"))
        .otherwise(pmod(h, lit(dim.toLong))).as("_bucket"),
      when(col("_t").isNull, lit(null).cast("long"))
        .otherwise(when(pmod(floor(h / 256).cast("long"), lit(2L)) === 0L, 1L)
          .otherwise(-1L)).as("_sg"))
    val cells = signed
      .groupBy(col(idCol), col("_bucket"))
      .agg(sum(col("_sg")).as("_v"))
    cells
      .groupBy(col(idCol))
      .agg(map_from_arrays(
        collect_list(coalesce(col("_bucket"), lit(-1L))),
        collect_list(coalesce(col("_v"), lit(0L)))).as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("_m"), i), lit(0L))).as("embedding"))
      .withColumn("norm2",
        aggregate(col("embedding"), lit(0L), (acc, v) => acc + v * v))
  }
}
