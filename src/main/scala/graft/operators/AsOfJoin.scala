package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the value columns of the
  * right row with the greatest timestamp <= the left timestamp within
  * the same key (the time-series point-in-time join Spark SQL lacks).
  *
  * Built by composition (preference (a) over a custom physical
  * operator): tag both sides, union, and carry right values forward
  * with `last(ignoreNulls)` over a (key, ts, side)-ordered window.
  * One shuffle on the key, one sort — the same cost as a sort-merge
  * join, regardless of how far back matches are. A per-left-row
  * range-subquery would be O(n·m) at 100 TB; this is O((n+m) log)
  * and AQE-skew-splittable.
  *
  * Right rows order BEFORE left rows at equal timestamps, so an exact
  * tie matches (ASOF <= semantics, as in pandas merge_asof /
  * DuckDB ASOF JOIN).
  */
object AsOfJoin {

  /** @param valueCols right columns carried onto left rows (must not
    *                  collide with left column names)
    * @param tolerance max allowed (leftTs - rightTs), same unit as the
    *                  ts columns' underlying type ordering; matches
    *                  older than this are nulled. Long.MaxValue = none.
    */
  def backward(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, valueCols: Seq[String],
               tolerance: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns
    val markedL = valueCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }.withColumn("_rts", lit(null).cast(right.schema(tsCol).dataType))
    val markedR = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(right.select((Seq(keyCol, tsCol) ++ valueCols).map(col): _*)
        .withColumn("_side", lit(0))
        .withColumn("_rts", col(tsCol))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val unioned = markedL.select((leftCols ++ valueCols ++ Seq("_side", "_rts")).map(col): _*)
      .unionByName(markedR.select((leftCols ++ valueCols ++ Seq("_side", "_rts")).map(col): _*))

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (valueCols :+ "_rts").foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    val withinTol: Column =
      if (tolerance == Long.MaxValue) lit(true)
      else col(tsCol).cast("long") - col("_rts").cast("long") <= tolerance

    val nulledOutside = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(col("_rts").isNotNull && withinTol, col(c)))
    }
    nulledOutside
      .filter(col("_side") === 1)
      .withColumn("matched_ts", when(withinTol, col("_rts")))
      .drop("_side", "_rts")
  }
}
