package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("sketch surfaces true heavy hitters on skewed data") {
    HeavyHitters.register(spark)
    // 'hot' = 40% of rows, 'warm' = 20%, tail of 400 uniques
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"tail_$i")
    val df = rows.toDF("tok").repartition(8) // force partial buffers + merge
    val out = df.agg(HeavyHitters.heavyHitters($"tok", 10).as("hh"))
      .selectExpr("inline(hh)")
      .as[(String, Long)].collect()
    val items = out.map(_._1).toSeq
    assert(items.contains("hot") && items.contains("warm"))
    assert(out.length <= 10)
    // MG guarantee: reported min_count underestimates by at most n/(k+1)
    val hot = out.find(_._1 == "hot").get._2
    assert(hot >= 400 - 1000 / 11)
  }

  test("grouped sketches are independent per group") {
    HeavyHitters.register(spark)
    val df = (Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y"))).toDF("g", "tok")
    val out = df.groupBy("g").agg(HeavyHitters.heavyHitters($"tok", 4).as("hh"))
      .select($"g", expr("hh[0].item"), expr("hh[0].min_count"))
      .as[(String, String, Long)].collect().map { case (g, i, c) => g -> (i, c) }.toMap
    assert(out("a") == ("x", 50L))
    assert(out("b") == ("y", 50L))
  }
}
