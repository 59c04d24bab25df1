package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CONTRASTIVE TRAINING-PAIR CONSTRUCTION — the last assembly step of
  * an embedding-model data pipeline (E5/GTE-class training): each
  * anchor document gets its labeled positive plus k NEGATIVES drawn
  * deterministically from the corpus, excluding the anchor and the
  * positive. The negative draw is the house md5-fold over
  * (anchor, slot), mapped into the corpus id space by the
  * ORDER-STATISTICS SKIP: draw uniformly from [0, n−2), then shift
  * past each sorted excluded id that the draw reaches — exact,
  * rejection-free (no data-dependent loop), and reproducible across
  * engines, which is what lets a cross-engine oracle replay every
  * sampled pair (and what makes the training set auditable: the same
  * corpus always yields the same pairs).
  *
  * Scale shape: map-only over the anchor set — the draw is arithmetic
  * on (anchor, slot, n); nothing joins the corpus until the caller
  * fetches features by id (an id-keyed join at their chosen moment).
  * The one corpus-scale input is the count, a scalar.
  */
object Contrastive {

  /** One row per (anchor, role, rank): the positive at rank 0 and k
    * deterministic negatives at ranks 1..k. Ids are assumed dense
    * 0..n−1 (the corpus-reindex contract of the packing/shuffle tier);
    * `positiveOf` maps an anchor id to its labeled positive's id.
    */
  def pairs(docs: DataFrame, idCol: String, anchorPred: org.apache.spark.sql.Column,
            positiveOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = docs.sparkSession
    val nRow = docs.agg(count(lit(1)).as("_n"))
    val anchors = docs.filter(anchorPred)
      .select(col(idCol).cast("long").as("anchor_id"))
      .crossJoin(broadcast(nRow))
      .withColumn("pos_id", positiveOf(col("anchor_id")))
    val positives = anchors
      .select(col("anchor_id"), lit("positive").as("role"),
        lit(0L).as("rank"), col("pos_id").as("other_id"))
    val negatives = anchors
      .select(col("anchor_id"), col("pos_id"), col("_n"),
        explode(sequence(lit(1), lit(k))).as("rank"))
      // draw ∈ [0, n-2), then shift past the two sorted excluded ids;
      // fail LOUDLY on a sub-3-document corpus — pmod by a
      // non-positive modulus would otherwise yield silent nulls
      .withColumn("_draw",
        when(col("_n") < 3L,
          raise_error(lit("contrastive: need >= 3 documents to draw negatives")))
          .otherwise(pmod(
            conv(substring(md5(concat_ws(":", col("anchor_id"), col("rank"))), 1, 15),
              16, 10).cast("long"), col("_n") - 2)))
      .withColumn("_e1", least(col("anchor_id"), col("pos_id")))
      .withColumn("_e2", greatest(col("anchor_id"), col("pos_id")))
      .withColumn("_s1", when(col("_draw") >= col("_e1"), col("_draw") + 1)
        .otherwise(col("_draw")))
      .withColumn("other_id", when(col("_s1") >= col("_e2"), col("_s1") + 1)
        .otherwise(col("_s1")))
      .select(col("anchor_id"), lit("negative").as("role"),
        col("rank").cast("long").as("rank"), col("other_id"))
    positives.unionByName(negatives)
  }
}
