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
  * the q65 oracle, so both engines miss identically.
  *
  * AT CORPUS SCALE the default blocking is IVF CENTROID IDS
  * ([[verdictsIvf]]): sign bits split on fixed axes, so bucket sizes
  * follow whatever mass the corpus puts on each orthant — one dense
  * orthant and Σ bucket² goes quadratic. A trained coarse quantizer
  * (IvfIndex) places its K centroids where the data is, so buckets
  * track the actual density and K is a direct fan-out dial (4096
  * centroids ≈ 4096-way split regardless of how the corpus skews).
  * The verdict machinery is IDENTICAL — both paths call
  * [[verdictsBlocked]] with a different bucket expression — so the
  * sign-signature path stays the engine-portable oracle surface (q65)
  * while IVF is the production default.
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

  /** Per-vector dedup verdict under an arbitrary blocking expression:
    * (id, kept, dup_of, n_matches, best_cosine). `dup_of` is the
    * smallest same-bucket id that matched at ≥ threshold (null when
    * kept). Only same-bucket pairs are ever compared — the blocking
    * expression IS the recall contract.
    */
  def verdictsBlocked(vectors: DataFrame, dim: Int, threshold: Double,
                      bucket: Column, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val bucketed = vectors.select(col(idCol), col(vecCol))
      .withColumn("_sig", bucket)
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

  /** Sign-signature blocking (the engine-portable q65 surface). */
  def verdicts(vectors: DataFrame, dim: Int, threshold: Double, signBits: Int = 4,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    verdictsBlocked(vectors, dim, threshold,
      signSignature(col(vecCol), signBits), idCol, vecCol)

  /** IVF-centroid blocking — the corpus-scale default: buckets are the
    * trained coarse quantizer's cells (map-only assignment, no extra
    * shuffle vs the sign path), so fan-out follows data density and
    * `model.centroids.length` dials it directly. Same recall contract
    * class: a pair straddling a centroid boundary is missed by design
    * (the IVF analogue of a flipped sign bit); raise K's refinements
    * or dedup with a second rotated model to tighten.
    */
  def verdictsIvf(vectors: DataFrame, dim: Int, threshold: Double,
                  model: IvfIndex.Model, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(model.dim == dim, s"model dim ${model.dim} != $dim")
    graft.functions.VectorExpressions.register(vectors.sparkSession)
    verdictsBlocked(vectors, dim, threshold,
      model.assignExpr(col(vecCol)), idCol, vecCol)
  }
}
