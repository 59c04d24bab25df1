package graft.functions

import graft.SparkSpec

/** Apportion — hand-computed Hamilton cases, the exact-sum and
  * quota properties under random masses, tie-break determinism,
  * the overflow guard, and partition invariance.
  */
class ApportionSpec extends SparkSpec {
  import spark.implicits._

  private def run(masses: Seq[(String, Long)], budget: Long) =
    Apportion.largestRemainder(
        masses.toDF("key", "mass"), "key", "mass", budget)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("hand case: equal masses, indivisible budget — tie to smaller key") {
    val q = run(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L), budget = 10L)
    // shares 10/3: base 3 each, one leftover; remainders all equal -> "a"
    assert(q("a") === ((1L, 3L, 1L, 4L)))
    assert(q("b") === ((1L, 3L, 0L, 3L)))
    assert(q("c") === ((1L, 3L, 0L, 3L)))
  }

  test("hand case: classic largest-remainder ordering") {
    // masses 47, 29, 24 over budget 100: bases 47, 29, 24 (exact)
    val exact = run(Seq("x" -> 47L, "y" -> 29L, "z" -> 24L), 100L)
    assert(exact.values.map(_._4).sum === 100L)
    assert(exact("x")._4 === 47L && exact("y")._4 === 29L && exact("z")._4 === 24L)
    // masses 5, 3, 1 over budget 7: shares 35/9=3.89, 21/9=2.33, 7/9=0.78
    // bases 3, 2, 0 (Σ5), two extras -> remainders 8, 3, 7: x then z
    val q = run(Seq("x" -> 5L, "y" -> 3L, "z" -> 1L), 7L)
    assert(q("x")._4 === 4L && q("y")._4 === 2L && q("z")._4 === 1L)
  }

  test("properties: quotas sum to budget, each within 1 of its share") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val masses = (0 until (2 + rnd.nextInt(12)))
        .map(i => s"k$i" -> (1L + rnd.nextInt(100000)))
      val budget = 1L + rnd.nextInt(1000000)
      val q = run(masses, budget)
      assert(q.values.map(_._4).sum === budget, s"trial $trial")
      val total = masses.map(_._2).sum.toDouble
      masses.foreach { case (k, m) =>
        val share = budget * m / total
        val quota = q(k)._4.toDouble
        assert(quota >= math.floor(share) && quota <= math.ceil(share),
          s"trial $trial key $k: quota $quota vs share $share")
      }
    }
  }

  test("zero-mass keys get zero; overflow raises instead of wrapping") {
    val q = run(Seq("a" -> 0L, "b" -> 10L), 5L)
    assert(q("a")._4 === 0L && q("b")._4 === 5L)
    val e = intercept[Exception] {
      run(Seq("a" -> Long.MaxValue / 2), budget = 1000000L)
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
    assert(chain.contains("overflows"), s"unexpected failure: $chain")
  }

  test("partition invariance") {
    val masses = (0 until 50).map(i => s"k$i" -> (i * 37L + 1L))
    val df = masses.toDF("key", "mass")
    def quotas(d: org.apache.spark.sql.DataFrame) =
      Apportion.largestRemainder(d, "key", "mass", 999983L)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(quotas(df.repartition(13)) === quotas(df))
  }
}
