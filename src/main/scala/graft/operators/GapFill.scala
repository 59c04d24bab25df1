package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap-fill + LOCF (last observation carried forward):
  * turn an irregular event stream into a dense per-key daily series —
  * the imputation step before any window/trend computation on data
  * that has silent gaps (no row ≠ zero; a missing day must inherit
  * the last known state, not NULL out).
  *
  * Shape: daily aggregates and the per-key [min, max] date range are
  * one map-side-combined groupBy each; the spine EXPLODES the date
  * range per key (rows = keys × span days — bounded by calendar span,
  * not event count, so a 100 TB event table with a 2-year span fans
  * out to ≤ 730 rows per key); the fill is a per-key ordered window
  * sweep (`last` with ignoreNulls — rows-unbounded-preceding frame,
  * evaluated in one pass per partition). Everything shuffles on the
  * key only.
  */
object GapFill {

  /** Dense daily series per key over [min(date), max(date)] of that
    * key: (keyCol, dateCol, n_events, filled_value, is_gap) where
    * filled_value is the value of the LAST event of the most recent
    * day with events (ties broken by `orderCols`, which must make
    * rows unique within a (key, date)), carried forward across gap
    * days.
    */
  def dailyLocf(events: DataFrame, keyCol: String, dateCol: String,
                orderCols: Seq[String], valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need a deterministic within-day order")
    val cnt = events.groupBy(col(keyCol), col(dateCol))
      .agg(count(lit(1)).as("n_events"))
    val byDay = Window.partitionBy(col(keyCol), col(dateCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val lastOfDay = events.withColumn("_rn", row_number().over(byDay))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col(dateCol), col(valueCol).as("_last_v"))
    val spine = events.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day"))).as(dateCol))
    val fillW = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(cnt, Seq(keyCol, dateCol), "left")
      .join(lastOfDay, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("_last_v"), ignoreNulls = true).over(fillW).as("filled_value"),
        (coalesce(col("n_events"), lit(0L)) === 0).as("is_gap"))
  }
}
