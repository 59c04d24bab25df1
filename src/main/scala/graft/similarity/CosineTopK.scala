package graft.similarity

import graft.functions.{VectorExpressions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor primitives over an embedding column.
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query set,
  * stream the corpus once, keep top-k per query with a TWO-PHASE
  * window — phase 1 ranks within each input partition (shuffle input:
  * nPartitions×k rows per query, not the corpus), phase 2 ranks the
  * survivors globally. A single global window per query key would
  * funnel the whole corpus through numQueries reducers, which dies at
  * 100 TB; this shape doesn't.
  */
object CosineTopK {

  /** Exact top-k by cosine. queries: (qidCol, vecCol); corpus:
    * (idCol, vecCol). Deterministic tiebreak on corpus id.
    *
    * The query set is BROADCAST and every corpus row is scored against
    * every query, so cost is |corpus|×|queries|: this is the exact
    * baseline for small query sets, not a bulk-ANN path. `maxQueries`
    * fails fast instead of silently degrading — route larger query
    * sets through [[IvfIndex]] or [[RandomProjectionLsh]].
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                qidCol: String = "query_id", idCol: String = "vec_id",
                vecCol: String = "embedding", maxQueries: Int = 1024): DataFrame = {
    val nQueries = queries.count()
    require(nQueries <= maxQueries,
      s"bruteTopK broadcasts the query set and scores |corpus|x|queries| pairs; " +
        s"got $nQueries queries > maxQueries=$maxQueries. " +
        s"Use IvfIndex.search or RandomProjectionLsh for large query sets, " +
        s"or raise maxQueries explicitly.")
    VectorExpressions.register(queries.sparkSession)
    val q = broadcast(queries.select(col(qidCol), col(vecCol).as("_qvec"))
      .withColumn("_qn", VectorFunctions.normNative(col("_qvec"))))
    val scored = corpus.select(col(idCol), col(vecCol))
      .withColumn("_cn", VectorFunctions.normNative(col(vecCol))) // once per corpus row
      .crossJoin(q) // broadcast hint → BroadcastNestedLoopJoin, corpus streams once
      .withColumn("cosine", VectorFunctions.cosineFromNorms(
        VectorFunctions.dotNative(col("_qvec"), col(vecCol)), col("_qn"), col("_cn")))
      .withColumn("_part", spark_partition_id())
    val local = Window.partitionBy(col(qidCol), col("_part"))
      .orderBy(col("cosine").desc, col(idCol))
    val global = Window.partitionBy(col(qidCol))
      .orderBy(col("cosine").desc, col(idCol))
    scored
      .withColumn("_lrn", row_number().over(local)).filter(col("_lrn") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cosine"))
  }

  /** Near-duplicate pairs by cosine within coarse buckets. The bucket
    * column bounds the join fan-out (IVF-style): only same-bucket
    * pairs are compared, so the shuffle is keyed on bucket and the
    * candidate count is Σ bucket² instead of n².
    */
  def bucketedNearDup(vectors: DataFrame, dim: Int, threshold: Double,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      bucketCol: String = "label"): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val withNorm = vectors.select(col(bucketCol).as("_b"), col(idCol), col(vecCol))
      .withColumn("_n", VectorFunctions.normNative(col(vecCol))) // once per vector, not per pair
    val a = withNorm.select(col("_b"), col(idCol).as("id_a"), col(vecCol).as("_va"), col("_n").as("_na"))
    val b = withNorm.select(col("_b"), col(idCol).as("id_b"), col(vecCol).as("_vb"), col("_n").as("_nb"))
    a.join(b, Seq("_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineFromNorms(
        VectorFunctions.dotNative(col("_va"), col("_vb")), col("_na"), col("_nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
