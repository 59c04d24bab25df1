package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash implementation shared by interpreted eval and generated
  * code. 64-bit fingerprint: FNV-1a hash per whitespace token,
  * bit-vote accumulate, sign → bit. Near-duplicate docs land within a
  * small Hamming distance.
  */
object SimHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Static entry point referenced from generated code. Locale.ROOT
    * lowercasing: the default-locale variant would fingerprint "TITLE"
    * differently under e.g. a Turkish JVM locale (dotless-ı), breaking
    * cross-engine and cross-executor determinism.
    */
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && Character.isWhitespace(text.charAt(start))) start += 1
      var end = start
      while (end < n && !Character.isWhitespace(text.charAt(end))) end += 1
      if (end > start) {
        val h = fnv1a64(text.substring(start, end))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      start = end
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Native Catalyst expression for SimHash64 — participates in
  * whole-stage codegen (doGenCode emits a static call), so a 100 TB
  * fingerprint pass stays a single generated scan-project loop with
  * no UDF serialization boundary.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** Register the expression with the session's function registry —
    * the public seam for exposing a native expression to both the
    * Column API (via call_function) and SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  /** Column API: simhash64 fingerprint of a text column. Requires
    * register(spark) once per session.
    */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", c)

  /** Hamming distance between two simhash columns (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
