package graft.functions

import graft.{SparkSpec, SparkEntry}

class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("HLL cardinality stays within its error bound vs exact") {
    val rows = SparkEntry.queries("q38_approx_distinct")(spark, sf())
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, exact, approx) =>
      val rel = math.abs(approx - exact).toDouble / math.max(1L, exact)
      assert(rel <= 0.1, s"$lang: approx $approx vs exact $exact (rel $rel)")
    }
  }
}
