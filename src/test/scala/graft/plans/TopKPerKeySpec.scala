package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sf())

  test("matches window row_number top-k exactly") {
    val viaPlan = TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(viaPlan == viaWindow)
    assert(viaPlan.nonEmpty)
  }

  test("the physical plan is the custom exec, not a sort-based window") {
    val df = TopK.perKey(orders, Seq("o_custkey"), Seq(col("o_totalprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("rows within a key come back in requested order; k larger than group is fine") {
    val few = Seq((1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L), (2L, 5.0, 103L))
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
    val top = TopK.perKey(few, Seq("o_custkey"), Seq(col("o_totalprice").desc), 10)
    val g1 = top.filter($"o_custkey" === 1L).select("o_totalprice").as[Double].collect()
    assert(g1.toSeq == Seq(30.0, 20.0, 10.0))
    assert(top.filter($"o_custkey" === 2L).count() == 1)
  }

  test("unknown columns fail fast") {
    intercept[IllegalArgumentException] {
      TopK.perKey(orders, Seq("nope"), Seq(col("o_totalprice").desc), 3)
    }
  }
}
