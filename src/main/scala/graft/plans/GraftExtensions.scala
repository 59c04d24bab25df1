package graft.plans

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions entry point — the supported way to make
  * graft's native expressions available to pure-SQL users cluster-wide:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * After which `SELECT simhash64(text), minhash_sig(text, 3, 32, 42)
  * FROM docs` works with no Scala imports. The Column API
  * (graft.functions.*) self-registers lazily, so library users need
  * neither the config nor explicit register calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // injectFunction needs (identifier, info, builder); reuse the same
    // builders the runtime registration uses.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles", "hashed_shingles(text, n) - sorted distinct hashes of char n-grams"),
      (es: Seq[Expression]) => HashedShingleSet(es.head, es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, n, k, seed) - k-wide MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int], es(3).eval() match {
          case i: Int => i.toLong
          case l: Long => l
        })))
    ext.injectFunction((FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(a, b) - Jaccard of two sorted bigint arrays"),
      (es: Seq[Expression]) => SortedLongJaccard(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - left-fold dot product of float arrays"),
      (es: Seq[Expression]) => FloatDotFold(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters", "heavy_hitters(col, k) - Misra-Gries heavy-hitter candidates (item, min_count)"),
      (es: Seq[Expression]) => HeavyHittersSketch(es.head,
        es(1).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("py_title"),
      info("py_title", "py_title(text) - CPython str.title() semantics incl. one-to-many case mappings"),
      (es: Seq[Expression]) => PyTitle(es.head)))
    ext.injectFunction((FunctionIdentifier("cms_estimates"),
      info("cms_estimates", "cms_estimates(col, probes, depth, width) - Count-Min frequency estimates per probe"),
      (es: Seq[Expression]) => CountMinSketchAgg(es.head,
        es(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).toSeq,
        es(2).eval().asInstanceOf[Int],
        es(3).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("cms_table"),
      info("cms_table", "cms_table(col, depth, width) - raw Count-Min counter matrix, row-major"),
      (es: Seq[Expression]) => CountMinTableAgg(es.head,
        es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("hll_distinct"),
      info("hll_distinct", "hll_distinct(col, p) - HyperLogLog distinct-count estimate with 2^p registers"),
      (es: Seq[Expression]) => HllAgg(es.head, es(1).eval().asInstanceOf[Int])
        .toAggregateExpression()))
  }
}

object GraftExtensions {
  /** Runtime registration for sessions created without the config. */
  def registerAll(spark: SparkSession): Unit = {
    SimHash.register(spark)
    ShingleFunctions.register(spark)
    VectorExpressions.register(spark)
    HeavyHitters.register(spark)
    PyTitleFunctions.register(spark)
    CountMin.register(spark)
    CountMin.registerTable(spark)
    HyperLogLog.register(spark)
  }
}
