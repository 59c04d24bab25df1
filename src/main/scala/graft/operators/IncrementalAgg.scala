package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized grouped aggregate: apply
  * a CDC delta batch (insert/delete rows; update = delete + insert)
  * to a (keys → count, sums) view WITHOUT rescanning the base fact
  * table — the counting algorithm of incremental view maintenance,
  * restricted to the self-maintainable aggregates (count, sum, and
  * avg derived from them). min/max are deliberately absent: they are
  * not self-maintainable under deletes (a retracted minimum forces a
  * rescan of its group) — callers needing them keep q14's window
  * top-k shape or recompute the affected groups.
  *
  * Per sum column the view carries BOTH the running sum and the
  * count of non-null inputs (`nn_<col>`): SQL `sum` over an all-null
  * (or empty) input is NULL, not 0, so after retractions a sum must
  * be reported as NULL exactly when its surviving non-null input
  * count hits zero. Without the companion count, delta-apply and
  * full recompute diverge on groups whose last non-null value was
  * deleted — the spec pins this case.
  *
  * Scale shape (the point of the operator at 100 TB): the delta is
  * pre-aggregated per key BEFORE the join (map-side partials, one
  * delta-sized shuffle), then full-outer-joined with the view — one
  * view-sized shuffle, or ZERO exchanges when the view is bucketed
  * on the key (B15). The base fact table is never read. Groups whose
  * count reaches zero are dropped (and never resurrect a stale sum);
  * a count driven negative means the delta retracted rows the view
  * never held — fail fast rather than publish a corrupt view.
  *
  * Reference analogue: the reference's Dagster batch loop recomputes
  * its summary tables per run (`restaurant_etl/pipeline.py`); this is
  * the same summary contract maintained from deltas instead.
  */
object IncrementalAgg {

  /** Materialize the view: one row per key with `n_rows` plus, per
    * sum column c, `sum_c` and its non-null input count `nn_c`.
    */
  def init(fact: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
        count(col(c)).as(s"nn_$c")))
    fact.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply a delta batch to a materialized view. `delta` carries the
    * fact schema plus `opCol` ∈ {insert, delete}; an update is a
    * delete of the old row + an insert of the new one (the CDC
    * apply's audit output — Upsert.merge — feeds this directly).
    * Returns the maintained view in `init`'s schema.
    */
  def applyDelta(view: DataFrame, delta: DataFrame, keyCols: Seq[String],
                 sumCols: Seq[String], opCol: String = "_op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    // fail fast on an op outside the contract instead of treating it
    // as a no-op: CaseWhen only evaluates the else branch on a bad row
    val sign = when(col(opCol) === "delete", lit(-1L))
      .when(col(opCol) === "insert", lit(1L))
      .otherwise(raise_error(
        concat(lit(s"IncrementalAgg: bad $opCol value "), col(opCol))).cast("long"))
    val dAggs = sum(sign).as("_d_n") +:
      sumCols.flatMap(c => Seq(
        sum(sign * col(c)).as(s"_d_sum_$c"),
        sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"_d_nn_$c")))
    val d = delta.groupBy(keyCols.map(col): _*).agg(dAggs.head, dAggs.tail: _*)

    val joined = view.join(d, keyCols, "full_outer")
    val nRows = coalesce(col("n_rows"), lit(0L)) + coalesce(col("_d_n"), lit(0L))
    val guarded = when(nRows < 0, raise_error(concat(
      lit("IncrementalAgg: negative count after delta for key "),
      concat_ws(",", keyCols.map(c => col(c).cast("string")): _*))))
      .otherwise(nRows)
    val sumOuts = sumCols.flatMap { c =>
      val nn = coalesce(col(s"nn_$c"), lit(0L)) + coalesce(col(s"_d_nn_$c"), lit(0L))
      val s = coalesce(col(s"sum_$c"), lit(0L)) + coalesce(col(s"_d_sum_$c"), lit(0L))
      Seq(when(nn > 0, s).as(s"sum_$c"), nn.as(s"nn_$c"))
    }
    joined
      .select(keyCols.map(col) ++ (guarded.as("n_rows") +: sumOuts): _*)
      .filter(col("n_rows") > 0)
  }
}
