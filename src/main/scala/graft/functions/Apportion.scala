package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact integer BUDGET APPORTIONMENT (Hamilton / largest-remainder):
  * the mixture-application stage of a training-data pipeline — given
  * per-source token masses and a total token budget, decide EXACTLY
  * how many tokens each source contributes so the quotas (a) sum to
  * the budget to the token, (b) are each within one token of the
  * source's proportional share (the quota property), and (c) are
  * deterministic. Published mixture weights (DoReMi-style, or the
  * hand-tuned per-source weights every LLM data card publishes) get
  * APPLIED through exactly this arithmetic — floating-point shares
  * would neither sum exactly nor reproduce across engines.
  *
  * quota_i = ⌊B·m_i/M⌋ + (1 if i is among the B−Σ⌊·⌋ largest
  * remainders, ties to the smaller key). All arithmetic is integer
  * and engine-portable — the q96 oracle replays it bit-for-bit.
  *
  * Scale shape: masses are a GROUP-scale table (sources/domains/
  * languages — thousands of rows at 100 TB, not corpus-scale), the
  * two scalars (Σm, Σbase) broadcast back, and the remainder rank is
  * a window over that group-scale table (single-partition sort of a
  * model-sized input, the PageRank-dim contract). The corpus-scale
  * work — producing the masses — is the caller's one aggregate.
  */
object Apportion {

  /** masses: one row per key with a non-negative integral mass.
    * Returns (key, mass, base_quota, extra, quota). Runtime-guarded
    * against Long overflow of mass×budget (the plan raises rather
    * than wrapping silently).
    */
  def largestRemainder(masses: DataFrame, keyCol: String, massCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val tot = masses.agg(
      sum(col(massCol)).as("_M"), max(col(massCol)).as("_mx"))
    // silent wraparound (non-ANSI) would corrupt quotas and an ANSI
    // overflow error names no remedy: evaluate the product only on
    // the safe branch (when() is per-row lazy in codegen) and raise
    // our own message otherwise — identical behavior in both modes,
    // and the raise lives INSIDE the consumed column so column
    // pruning can't optimize the guard away
    val safe = col("_mx") <= lit(Long.MaxValue / budget) && col(massCol) >= 0
    val based = masses.crossJoin(broadcast(tot))
      .withColumn("_p", when(safe, col(massCol) * lit(budget))
        .otherwise(raise_error(
          lit(s"mass * budget=$budget overflows Long (pre-scale masses)")).cast("long")))
      .select(col(keyCol), col(massCol),
        expr(s"_p DIV _M").as("base_quota"),
        (col("_p") % col("_M")).as("_rem"))
    val extraTotal = based.agg((lit(budget) - sum(col("base_quota"))).as("_R"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col(keyCol).asc)
    based.withColumn("_rn", row_number().over(w))
      .crossJoin(broadcast(extraTotal))
      .select(col(keyCol), col(massCol),
        col("base_quota"),
        when(col("_rn") <= col("_R"), 1L).otherwise(0L).as("extra"))
      .withColumn("quota", col("base_quota") + col("extra"))
  }
}
