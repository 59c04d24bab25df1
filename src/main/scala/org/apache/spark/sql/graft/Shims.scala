package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` constructors that third-party
  * plan nodes need (the same doorway Delta Lake and friends use: a
  * shim inside an org.apache.spark.sql subpackage). Kept to three
  * one-liners — everything else in graft uses public API.
  */
object Shims {
  /** DataFrame from a custom LogicalPlan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a Column — eagerly converted
    * (ExpressionUtils.expression returns a lazy ColumnNodeExpression
    * wrapper whose internal nodes are neither resolvable by custom
    * plans nor serializable).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
