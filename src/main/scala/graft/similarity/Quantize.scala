package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-dimension INT8 quantization of an embedding corpus —
  * the serving-tier memory cut (float32 → int8 = 4×) every ANN stack
  * applies before IVF/PQ residuals or brute-force rescoring: scale_d
  * = max |x_d| over the corpus, code = floor(x·127/scale_d). Both
  * steps are engine-portable by construction: max is order-free, the
  * per-element floor sees identical double arithmetic in any engine,
  * and no floating-point SUM ever happens (the q168 discipline) — so
  * a cross-engine oracle can replay the whole quantization matrix
  * bit-for-bit. floor (not round-half-X) keeps the code free of the
  * one FP operation engines genuinely disagree on.
  *
  * Scale shape: ONE dim-keyed partial aggregate over the exploded
  * corpus (map-side combine — the shuffle moves `dim` rows per task),
  * then a broadcast of the tiny scale table back onto the map side;
  * the quantization itself is map-only. At 100 TB nothing here
  * exceeds a per-task accumulator of `dim` doubles.
  */
object Quantize {

  /** (id, dim, x, scale, code) int8 codes for every vector element —
    * the serving artifact. An all-zero dimension (scale 0) codes to 0.
    */
  def int8Codes(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = df
      .select(col(idCol).cast("long").as("id"), posexplode(col(embCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
    val scales = e.groupBy("dim").agg(max(abs(col("x"))).as("scale"))
    e.join(broadcast(scales), Seq("dim"))
      .withColumn("code", when(col("scale") === 0.0, 0L)
        .otherwise(floor(col("x") * lit(127.0) / col("scale")).cast("long")))
  }

  /** Per-dimension audit of the quantization matrix: the order-free
    * scale, integer code stats, and an id-weighted code sum that pins
    * every (vector, code) assignment without a float sum.
    */
  def int8Stats(df: DataFrame, idCol: String, embCol: String): DataFrame =
    int8Codes(df, idCol, embCol)
      .groupBy(col("dim"))
      .agg(max(col("scale")).as("scale"),
        count(lit(1)).as("n"),
        sum(col("code")).as("sum_code"),
        min(col("code")).as("min_code"),
        max(col("code")).as("max_code"),
        sum(col("code") * (col("id") + 1L)).as("sum_code_weighted"))

  /** (id, c) int8 code VECTORS in dim order — the dense serving
    * artifact (sort_array over (dim, code) structs, so the layout is
    * deterministic regardless of aggregation order).
    */
  def int8Vectors(df: DataFrame, idCol: String, embCol: String): DataFrame =
    int8Codes(df, idCol, embCol)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("code")))),
        x => x("code")).as("c"))

  /** SYMMETRIC INT8 ANN: top-k by the INTEGER dot product in code
    * space — the production serving arithmetic (SIMD int8 kernels)
    * and, unlike any float scoring, exactly replayable by a
    * cross-engine oracle: every score is Σ_d q_d·x_d over int8 codes,
    * ties broken by ascending id. The query codes ride a broadcast
    * (k query rows), the corpus side is MAP-ONLY scoring + the
    * per-query top-k — no corpus-scale shuffle beyond the final
    * k·|queries| rows.
    */
  def int8TopK(df: DataFrame, idCol: String, embCol: String,
               queryPred: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val vecs = int8Vectors(df, idCol, embCol)
    val queries = vecs.filter(queryPred)
      .select(col("id").as("query_id"), col("c").as("qc"))
    val scored = vecs.crossJoin(broadcast(queries))
      .withColumn("score",
        aggregate(zip_with(col("qc"), col("c"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
    // corpus-wide reduction through the heap operator (never a
    // per-query window funnel); the trailing window only re-ranks the
    // <= k·|queries| survivors to attach rk
    val top = graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("id")), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("query_id"), col("rk"), col("id").as("vec_id"), col("score"))
  }
}
