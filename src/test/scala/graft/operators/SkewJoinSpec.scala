package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (Seq.fill(500)(1L) ++ (2L to 50L)).zipWithIndex
    .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
  private lazy val dim = (1L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted join equals plain join") {
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", factor = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain && salted.size == fact.count())
  }

  test("hot-key variant equals plain join too") {
    val plain = fact.join(dim, Seq("k")).select("k", "v")
      .as[(Long, Long)].collect().toSet
    val hot = SkewJoin.saltedJoinHotKeys(fact, dim, "k", hotKeys = Seq(1L), factor = 8)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(hot == plain)
  }

  test("salt actually spreads the hot key across salt values") {
    val salts = fact.filter($"k" === 1L)
      .withColumn("_salt", pmod(xxhash64($"k", monotonically_increasing_id()), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts > 4, s"hot key only hit $salts salt values")
  }
}
