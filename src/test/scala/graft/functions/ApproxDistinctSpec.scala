package graft.functions

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("HLL cardinality stays within its error bound vs exact") {
    val rows = Tables.documents(spark, sf())
      .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(
        countDistinct(col("tok")).as("exact"),
        approx_count_distinct(col("tok"), 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, exact, approx) =>
      val rel = math.abs(approx - exact).toDouble / math.max(1L, exact)
      // 3x the configured 2% rsd — far tighter than q38's oracle bound
      assert(rel <= 0.06, s"$lang: approx $approx vs exact $exact (rel $rel)")
    }
  }

  test("q38 reports the sketch inside the 10% oracle bound") {
    val rows = SparkEntry.queries("q38_approx_distinct")(spark, sf())
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, _, ok) => assert(ok, s"$lang sketch outside bound") }
  }
}
