package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scale-shape assertions: these queries must produce the plan we'd
  * want at 100 TB — filters/projections reaching the parquet scan,
  * dims broadcast (no fact shuffle for the join), codegen'd custom
  * expressions. Catching a plan regression here is the point; the
  * value-correctness is covered by the DuckDB oracle gate.
  */
class PlanShapeSpec extends SparkSpec {

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q11: predicate and column pruning reach the parquet scan") {
    val plan = formatted("q11_filter_project")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("l_shipdate"), s"no pushed filters in:\n$plan")
    // only the 4 referenced columns in ReadSchema, not all 11
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey"), s"scan reads unneeded columns: $readSchema")
  }

  test("q12: dim side broadcast — no shuffle of the fact for the join") {
    val plan = formatted("q12_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q10: partial aggregation before the exchange (map-side combine)") {
    val plan = formatted("q10_agg")
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate in:\n$plan")
  }

  test("q13: all dimension joins are broadcast at sf0.001") {
    val plan = formatted("q13_multi_join")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("simhash expression supports codegen (no CodegenFallback)") {
    val expr = graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"))
    assert(!expr.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
  }

  test("exact dedup shuffles only (fingerprint, id), never the payload") {
    // AQE wraps exchanges in query stages lazily; inspect the static plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = dedup.ExactDedup.groups(Tables.documents(spark, sf("sf0.001")), "doc_id", "text")
      val ex = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(ex.nonEmpty, "expected a shuffle for the fingerprint groupBy")
      ex.foreach { s =>
        val cols = s.output.map(_.name)
        assert(!cols.contains("text"), s"shuffle carries document payload: $cols")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
