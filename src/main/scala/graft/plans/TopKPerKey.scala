package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Shims

/** Per-key top-k as a first-class operator (logical node + strategy +
  * physical exec), the (c)-tier custom-operator path: semantics the
  * built-ins only reach via window `row_number`, whose sort-based
  * execution materializes and fully sorts every key group. This exec
  * keeps a bounded k-row heap per key, so memory is keys x k rows
  * instead of the whole partition, and no sort of the full data ever
  * happens — the shape you want when k=10 on 100 TB.
  *
  * The required child distribution is clustering on the keys: Spark's
  * EnsureRequirements inserts the (single) hash exchange, AQE still
  * re-plans it, and everything upstream stays untouched.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderCopy = order
    val keysCopy = keys
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keysCopy, childOutput)
      val ordering = GenerateOrdering.generate(orderCopy, childOutput)
      // per key: a max-heap (reverse of the requested order) capped at
      // k — the root is the worst retained row, evicted on improvement.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain = reverse order
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Public API. */
object TopK {

  /** Idempotent strategy installation (also available cluster-wide via
    * graft.plans.GraftExtensions).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    }
  }

  /** Top-k rows per key by the given sort order (e.g.
    * `TopK.perKey(orders, Seq("o_custkey"), Seq(col("o_totalprice").desc), 3)`).
    * Rows within a key come back in the requested order.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(keyCols.nonEmpty && orderBy.nonEmpty && k > 0)
    val spark = df.sparkSession
    install(spark)
    val child = Shims.logicalPlan(df)
    val resolve = child.output.map(a => a.name -> a).toMap
    val keys = keyCols.map(n => resolve.getOrElse(n,
      throw new IllegalArgumentException(s"unknown key column $n")))
    val order = orderBy.map { c =>
      Shims.expression(c) match {
        case s: SortOrder => s.copy(child = rebind(s.child, resolve))
        case e => SortOrder(rebind(e, resolve), org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Shims.ofRows(spark, TopKPerKeyPlan(keys, order, k, child))
  }

  private def rebind(e: Expression, resolve: Map[String, Attribute]): Expression =
    e.transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        resolve.getOrElse(u.name,
          throw new IllegalArgumentException(s"unknown order column ${u.name}"))
    }
}
