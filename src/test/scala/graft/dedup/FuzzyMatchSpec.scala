package graft.dedup

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    (1L, "Butter Chicken"), (2L, "Paneer Tikka"), (3L, "Plain Dosa"))
    .toDF("id", "name")

  test("typos within maxDist match; unrelated names do not") {
    val queries = Seq(
      (10L, "Buter Chicken"),   // 1 deletion
      (11L, "Paneer Tika"),     // 1 deletion
      (12L, "Pl4in Dosa"),      // 1 substitution
      (13L, "Chicken Butter"))  // word swap — far
      .toDF("id", "name")
    val m = FuzzyMatch.fuzzyPairs(catalog, queries, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(m == Set((1L, 10L, 1L), (2L, 11L, 1L), (3L, 12L, 1L)))
  }

  test("blocking is a recall tradeoff: a first-char typo falls outside the block") {
    val queries = Seq((20L, "Xutter Chicken")).toDF("id", "name") // dist 1 but block differs
    val m = FuzzyMatch.fuzzyPairs(catalog, queries, maxDist = 1)
      .as[(Long, Long, Long)].collect()
    assert(m.isEmpty)
    // widening the blocking function (here: trivial constant block) recovers it
    val all = FuzzyMatch.fuzzyPairs(catalog, queries, maxDist = 1,
      blockFn = (_, _) => org.apache.spark.sql.functions.lit("*"))
      .as[(Long, Long, Long)].collect()
    assert(all.toSet == Set((1L, 20L, 1L)))
  }

  test("length-band prune never drops a true match") {
    val queries = Seq((30L, "Butter Chickenss")).toDF("id", "name") // dist 2
    val d1 = FuzzyMatch.fuzzyPairs(catalog, queries, maxDist = 1).count()
    val d2 = FuzzyMatch.fuzzyPairs(catalog, queries, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(d1 == 0 && d2 == Set((1L, 30L, 2L)))
  }
}
