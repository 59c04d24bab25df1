package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-shaped EMBEDDING-level deduplication: drop documents
  * whose embeddings are near-identical to a kept document's — the
  * semantic companion to MinHashLsh's lexical near-dup (two docs can
  * share no shingles yet embed onto the same point).
  *
  * Blocking is the SIGN SIGNATURE of the leading dims — the 1-bit
  * quantization of the embedding, a deterministic data-derived coarse
  * code. Candidates are same-signature pairs only, so the shuffle is
  * keyed on the signature and candidate count is Σ bucket² instead of
  * n²; `signBits` trades recall for fan-out (more bits → smaller
  * buckets → cheaper join, more missed pairs whose near-zero leading
  * dim flips sign between the two vectors). That recall tradeoff is
  * the standard blocked-dedup contract, and it is mirrored exactly in
  * the q65 oracle, so both engines miss identically. At corpus scale,
  * raise signBits (doubling buckets per bit) or swap the signature
  * for IVF centroid ids (`IvfIndex`) — the verdict machinery is
  * unchanged.
  *
  * Verdicts follow IncrementalDedup.selfDuplicates' min-id-keeper
  * shape: a vector matching any smaller-id vector at ≥ threshold is
  * a duplicate of the smallest such id; everything else is kept.
  */
object SemDedup {

  /** Σ 2^i over dims whose value is ≥ 0 — the blocking signature. */
  def signSignature(vec: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"signBits out of range: $bits")
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Per-vector dedup verdict: (id, kept, dup_of, n_matches,
    * best_cosine). `dup_of` is the smallest same-signature id that
    * matched at ≥ threshold (null when kept).
    */
  def verdicts(vectors: DataFrame, dim: Int, threshold: Double, signBits: Int = 4,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = vectors.select(col(idCol), col(vecCol))
      .withColumn("_sig", signSignature(col(vecCol), signBits))
    val pairs = CosineTopK.bucketedNearDup(
      bucketed, dim, threshold, idCol, vecCol, bucketCol = "_sig")
    val dups = pairs.groupBy(col("id_b"))
      .agg(min(col("id_a")).as("dup_of"),
        count(lit(1)).as("n_matches"),
        max(col("cosine")).as("best_cosine"))
    vectors.select(col(idCol))
      .join(dups, col(idCol) === col("id_b"), "left")
      .select(col(idCol),
        col("dup_of").isNull.as("kept"),
        col("dup_of"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_cosine"))
  }
}
