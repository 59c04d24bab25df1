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

/** Exact integer SSE over two long-array columns — one primitive
  * loop, codegen'd (r15: the q210/q211 zip_with+aggregate HOF pair
  * evaluated its lambdas interpreted PER ELEMENT; at 4.5M candidate
  * pairs × 64 dims that interpretation was the whole cost). Values
  * identical to aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),0,+) —
  * integer arithmetic has no fold-order sensitivity.
  */
object LongSseImpl {
  def sse(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class LongSseFold(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    LongSseImpl.sse(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongSseImpl.sse($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSseFold =
    copy(left = l, right = r)
}

object LongSseExpressions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_sse", es => LongSseFold(es.head, es(1)), "scala_udf")

  def longSse(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("long_sse", a, b)
}
