package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis (the windowFunnel class of sequential
  * pattern matching): per entity, how deep into an ordered step
  * sequence (e.g. view → click → purchase) its event stream gets,
  * where step k+1 only counts strictly AFTER the automaton has
  * reached step k — a purchase before the first view must not count,
  * so this is NOT three independent conditional mins.
  *
  * Shape: one shuffle on the entity key; events sort inside a
  * collected array by (order value, tiebreak id) — fully
  * deterministic — and a codegen'd higher-order left-fold runs the
  * (steps+1)-state automaton. The per-entity buffer holds that
  * entity's events, bounded by per-entity activity (production
  * bounds it with a retention window, or per-session via a
  * sessionize pre-pass).
  */
object Funnel {

  /** Per-entity funnel depth: (keyCol, n_events, funnel_stage,
    * converted) with funnel_stage in [0, steps.length].
    *
    * @param orderCol monotone event order (e.g. ts_us); ties broken
    *                 by `tiebreakCol`, which must make (order, tiebreak)
    *                 unique for a deterministic fold
    */
  def depth(events: DataFrame, keyCol: String, orderCol: String,
            tiebreakCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val nSteps = steps.length
    val folded = events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col(orderCol), col(tiebreakCol), col(typeCol).as("_t"))))
          .as("_evs"))
      .withColumn("funnel_stage",
        aggregate(col("_evs"), lit(0),
          (acc, e) => steps.zipWithIndex.foldLeft(when(lit(false), acc)) {
            case (w, (step, i)) => w.when(acc === i && e("_t") === step, i + 1)
          }.otherwise(acc)).cast("long"))
    folded.select(col(keyCol), col("n_events"), col("funnel_stage"),
      (col("funnel_stage") === nSteps).as("converted"))
  }
}
