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
  * entity's events, bounded by per-entity activity; `windowedDepth`
  * adds the maxSpan retention bound (windowFunnel semantics) that
  * production funnels use to cap it.
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

  /** Windowed funnel depth (the published windowFunnel operator): the
    * whole step chain must complete within `maxSpan` of the chain's
    * FIRST event, and the depth is the MAX over all candidate chains
    * — not just the greedy first one ({@link depth} with an infinite
    * span is the special case where greedy is optimal).
    *
    * Fold state is an ANCHORS array, one slot per step, holding the
    * chain-start order-value of the best chain that has reached that
    * step (sentinel −1): a step-1 event advances slot 0 to its own
    * order value; a step-k event within `maxSpan` of slot k−2's anchor
    * propagates that anchor to slot k−1. Keeping the LATEST anchor per
    * slot is optimal (a later chain start can only extend the window's
    * future reach — `greatest` makes that explicit), so one left-fold
    * pass computes the max-over-chains depth, and the per-entity
    * buffer question disappears at the operator level: `maxSpan` is
    * exactly the retention bound production funnels need (events older
    * than maxSpan below the frontier can't anchor new chains).
    *
    * Depth = count of non-sentinel slots (slot k set implies slot k−1
    * was set earlier, so set slots form a prefix).
    */
  def windowedDepth(events: DataFrame, keyCol: String, orderCol: String,
                    tiebreakCol: String, typeCol: String, steps: Seq[String],
                    maxSpan: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(maxSpan > 0, s"maxSpan must be positive: $maxSpan")
    val nSteps = steps.length
    val init = array((0 until nSteps).map(_ => lit(-1L)): _*)
    val folded = events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col(orderCol), col(tiebreakCol), col(typeCol).as("_t"))))
          .as("_evs"))
      .withColumn("_anchors",
        aggregate(col("_evs"), init, (acc, e) => array((0 until nSteps).map { k =>
          val cur = element_at(acc, k + 1)
          if (k == 0)
            when(e("_t") === steps(0), greatest(cur, e(orderCol))).otherwise(cur)
          else {
            val prev = element_at(acc, k)
            when(e("_t") === steps(k) && prev >= 0 && e(orderCol) - prev <= maxSpan,
              greatest(cur, prev)).otherwise(cur)
          }
        }: _*)))
      .withColumn("funnel_stage",
        size(filter(col("_anchors"), a => a >= 0)).cast("long"))
    folded.select(col(keyCol), col("n_events"), col("funnel_stage"),
      (col("funnel_stage") === nSteps).as("converted"))
  }
}
