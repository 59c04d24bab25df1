package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gaps-and-islands over ranges): merge each
  * key's overlapping-or-touching [start, end] intervals into maximal
  * islands — validity-range cleanup after SCD merges, downtime-window
  * consolidation, coverage analysis, the range counterpart of q35's
  * point-event sessionization.
  *
  * Classic single-window algorithm: per key in (start, end) order, an
  * interval opens a NEW island iff its start exceeds the running max
  * of all previous ends (strictly — touching intervals merge);
  * island id = running count of opens; one groupBy finishes. Cost is
  * one keyed shuffle + one window sweep + one partial-agg'd groupBy —
  * no self-join (the naive overlap join is quadratic per key), and
  * the window frame carries ONE value (the running max), so state is
  * O(1) per row however long the key's history.
  */
object Intervals {

  /** Maximal merged islands per key. Output: (key, island_start,
    * island_end, n_intervals) — `n_intervals` = how many source rows
    * merged into the island. Intervals are treated as closed
    * [start, end]: touching (next.start == prev.end) merges; use
    * end−1 upstream for half-open semantics.
    *
    * Duplicate (key, start, end) rows are pre-aggregated to one row
    * with a count BEFORE the window sweep. That makes the window's
    * (start, end) order TOTAL — r13: with duplicates present, an
    * engine is free to order the twins differently in the open-flag
    * window and the island-sum window, and one twin's open flag then
    * attaches to the other's island (caught at sf0.1 against DuckDB:
    * islands overlapped). It is also the cheaper plan — the dedup is
    * a partial-aggregated groupBy, so at scale the window sorts
    * distinct spans, not raw rows.
    */
  def coalesceIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val uniq = df.groupBy(col(keyCol), col(startCol), col(endCol))
      .agg(count(lit(1)).as("_cnt"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L)
    uniq.withColumn("_open", opens)
      .withColumn("_island", sum(col("_open")).over(byKey))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        sum(col("_cnt")).as("n_intervals"))
      .drop("_island")
  }
}
