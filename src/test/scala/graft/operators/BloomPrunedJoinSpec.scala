package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomPrunedJoin — exact parity with the plain inner join (null
  * keys, duplicate keys both sides, tiny-m false-positive floods),
  * no false negatives ever, and a real reduction when selective.
  */
class BloomPrunedJoinSpec extends SparkSpec {
  import spark.implicits._

  // big: 400 rows, keys 0..199 twice, plus null keys; small: 10 keys
  // (5 matching evens, 5 absent), one duplicated
  private lazy val big = ((0L until 400L).map(i => (Option(i % 200), s"row$i")) ++
    Seq((Option.empty[Long], "null1"), (Option.empty[Long], "null2")))
    .toDF("k", "payload")
  private lazy val small = (Seq(0L, 2L, 4L, 6L, 8L, 1000L, 1001L, 1002L, 1003L, 1004L)
    .map(k => (k, s"dim$k")) :+ (0L, "dim0b")).toDF("k", "attr")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
    df.select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("result-identical to the plain inner join, incl. dup keys and null keys") {
    val plain = rows(big.join(small, Seq("k")))
    assert(plain.nonEmpty && plain.exists(_._3 == "dim0b"), "dup dim key must fan out")
    assert(rows(BloomPrunedJoin.inner(big, small, "k")) === plain)
  }

  test("a tiny filter (false positives everywhere) is still exact") {
    // m=16 forces heavy position collision: almost everything passes
    // the bloom, the real join still decides
    assert(rows(BloomPrunedJoin.inner(big, small, "k", k = 2, m = 16)) ===
      rows(big.join(small, Seq("k"))))
  }

  test("no false negatives; selective joins prune most of the big side") {
    val pruned = BloomPrunedJoin.pruneProbe(big, small, "k")
    val prunedKeys = pruned.select("k").distinct().as[Long].collect().toSet
    assert(Set(0L, 2L, 4L, 6L, 8L).subsetOf(prunedKeys),
      "every truly-matching key must survive the filter")
    val n = pruned.count()
    // 10 of 400 rows truly match (5 keys × 2 copies); allow bloom FPs
    // but require a real reduction
    assert(n >= 10L && n <= 40L, s"expected a ~10-row probe, got $n of 402")
  }
}
