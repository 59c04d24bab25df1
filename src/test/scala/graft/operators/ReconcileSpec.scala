package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reconcile — checksum sensitivity and diff verdicts. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1L to 200L).map(k => (k, k * 10, s"s$k"))

  test("identical tables match in every bucket") {
    val a = base.toDF("k", "v", "s")
    val d = Reconcile.diff(a, a, "k", Seq("k", "v", "s"), buckets = 16).collect()
    assert(d.nonEmpty && d.forall(_.getAs[Boolean]("matches")))
    assert(d.map(_.getAs[Long]("n_a")).sum === 200L)
  }

  test("a single mutated row flips exactly its bucket") {
    val a = base.toDF("k", "v", "s")
    val b = base.map { case (k, v, s) => if (k == 57L) (k, v + 1, s) else (k, v, s) }
      .toDF("k", "v", "s")
    val d = Reconcile.diff(a, b, "k", Seq("k", "v", "s"), buckets = 16).collect()
    val bad = d.filter(!_.getAs[Boolean]("matches"))
    assert(bad.length === 1, "exactly one bucket mismatches")
    assert(bad.head.getAs[Long]("n_a") === bad.head.getAs[Long]("n_b"),
      "a value mutation keeps counts equal — only the xor hash differs")
  }

  test("a deleted row shows up as a count mismatch in its bucket") {
    val a = base.toDF("k", "v", "s")
    val b = base.filterNot(_._1 == 99L).toDF("k", "v", "s")
    val d = Reconcile.diff(a, b, "k", Seq("k", "v", "s"), buckets = 16).collect()
    val bad = d.filter(!_.getAs[Boolean]("matches"))
    assert(bad.length === 1)
    assert(bad.head.getAs[Long]("n_a") === bad.head.getAs[Long]("n_b") + 1)
  }

  test("null and empty values hash distinctly (separator + sentinel)") {
    val a = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "v", "s")
    val b = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "v", "s")
    val d = Reconcile.diff(a, b, "k", Seq("k", "v", "s"), buckets = 4).collect()
    assert(d.exists(!_.getAs[Boolean]("matches")),
      "(null, x) and (x, null) must not collide")
    val e = Seq((1L, "ab", "c")).toDF("k", "v", "s")
    val f = Seq((1L, "a", "bc")).toDF("k", "v", "s")
    val d2 = Reconcile.diff(e, f, "k", Seq("k", "v", "s"), buckets = 4).collect()
    assert(d2.exists(!_.getAs[Boolean]("matches")),
      "(ab, c) and (a, bc) must not collide")
  }
}
