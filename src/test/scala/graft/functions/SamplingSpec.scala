package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 10000L).toDF("id")

  test("split proportions approximate the weights over many keys") {
    val counts = keys.select(Sampling.splitLabel(col("id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5)).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 9000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 150, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 500L) < 150, s"test=${counts("test")}")
    assert(counts.values.sum == 10000L)
  }

  test("membership is invariant under repartitioning (unlike rand-based sample)") {
    val a = keys.select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    val b = keys.repartition(17).select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("smaller sample percentages are strict subsets of larger ones") {
    val s5 = keys.filter(Sampling.sampledBy(col("id"), 5)).as[Long].collect().toSet
    val s20 = keys.filter(Sampling.sampledBy(col("id"), 20)).as[Long].collect().toSet
    assert(s5.subsetOf(s20))
    assert(s5.nonEmpty && s20.size > s5.size)
  }

  test("weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.splitLabel(col("id"), Seq("train" -> 80, "val" -> 10))
    }
  }

  test("stratified keep rates apply per stratum and stay hash-deterministic") {
    val df = (1L to 4000L).toDF("id")
      .withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val kept = df.filter(Sampling.stratifiedKeep(col("id"), col("lang"), Seq("en" -> 25)))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("de") == 2000L)                       // default 100%
    assert(math.abs(kept("en") - 500L) < 120, s"en=${kept("en")}") // ~25%
    // the kept 25% is a subset of the flat 25% sample on the same key
    val strat = df.filter(col("lang") === "en")
      .filter(Sampling.stratifiedKeep(col("id"), col("lang"), Seq("en" -> 25)))
      .select("id").as[Long].collect().toSet
    val flat = df.filter(col("lang") === "en")
      .filter(Sampling.sampledBy(col("id"), 25)).select("id").as[Long].collect().toSet
    assert(strat == flat)
  }
}
