package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable Bloom filter: the no-false-negative structural guarantee,
  * a bounded false-positive rate at the documented (k, m), and
  * partitioning invariance (the filter is a pure function of the key
  * set).
  */
class PortableBloomSpec extends SparkSpec {

  import PortableBloom._

  test("no false negatives: every inserted key tests positive") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"key-$i").toDF("k")
    val bloom = build(keys, "k", k = 3, m = 1 << 16)
    val verdicts = mightContain(keys, Seq.empty, "k", bloom, k = 3, m = 1 << 16)
    assert(verdicts.filter(!col("might_contain")).count() == 0L)
  }

  test("false-positive rate stays near theory at k=3") {
    import spark.implicits._
    val m = 1 << 16
    val inserted = (0 until 2000).map(i => s"key-$i").toDF("k")
    val absent = (0 until 2000).map(i => s"absent-$i").toDF("k")
    val bloom = build(inserted, "k", k = 3, m = m)
    val fp = mightContain(absent, Seq.empty, "k", bloom, k = 3, m = m)
      .filter(col("might_contain")).count()
    // theory: (1 - e^(-kn/m))^3 ≈ (0.088)^3 ≈ 0.0007 → expect ~1.4 of
    // 2000; the fixed hash makes the count deterministic — bound it
    // an order of magnitude above theory, far below a broken hash
    assert(fp <= 20, s"false-positive count $fp way above theory (~1-2 of 2000)")
  }

  test("membership is map-side: k broadcast joins, no probe-side exchange") {
    import spark.implicits._
    val keys = (0 until 100).map(i => s"key-$i").toDF("k")
    // materialize the filter so its own build-time distinct exchange
    // (bloom-sized, one-off) is out of the membership plan under test
    val bloom = build(keys, "k", k = 3, m = 1 << 12).localCheckpoint()
    val plan = mightContain(keys, Seq.empty, "k", bloom, k = 3, m = 1 << 12)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3, plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe side must not shuffle:\n$plan")
  }

  test("filter is partitioning-invariant") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"key-$i").toDF("k")
    val a = build(keys.repartition(1), "k", k = 3, m = 1 << 12)
      .orderBy("bloom_pos").collect().map(_.getLong(0)).toSeq
    val b = build(keys.repartition(7), "k", k = 3, m = 1 << 12)
      .orderBy("bloom_pos").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
