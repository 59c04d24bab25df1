package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Native dot product over float-array columns.
  *
  * Computes EXACTLY the same value as VectorFunctions.dotFold — a
  * strict left-to-right fold of (double)a[i] * (double)b[i] starting
  * from 0.0 — so results remain bit-identical to the mirrored SQL
  * oracle; it just does it in one primitive loop instead of a
  * transform+aggregate HOF pair (which allocates an intermediate
  * array and boxes every element).
  */
object VectorImpl {
  def dotFold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class FloatDotFold(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.dotFold($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDotFold =
    copy(left = l, right = r)
}

object VectorExpressions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", es => FloatDotFold(es.head, es(1)), "scala_udf")

  def floatDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("float_dot", a, b)
}
