package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located (bucketed) joins — the zero-shuffle join path for
  * repeatedly-joined fact tables at scale: both sides bucketed by the
  * join key into the same bucket count join with NO Exchange in the
  * plan. This is the on-disk layout SURVEY §4 prescribes for the
  * 100 TB fact tables.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val wh = Files.createTempDirectory("graft_wh").toString // explicit paths; warehouse conf is static
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")

    Tables.lineitem(spark, sf()).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sf()).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/or_b").saveAsTable("or_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("li_b")
        .join(spark.table("or_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"))
      // the join itself must not re-shuffle either bucketed side
      val exchangesBeforeAgg = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(plan).size
      assert(exchangesBeforeAgg == 0, s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }
}
