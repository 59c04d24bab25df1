package graft.operators

import graft.SparkSpec

/** PageRank — analytic fixed points, dangling mass, rank conservation. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 30): Map[Long, Double] =
    PageRank.ranks(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle converges to the uniform fixed point, ranks sum to 1") {
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("a sink (dangling node) keeps total rank at 1 and outranks its feeders") {
    // 1 -> 3, 2 -> 3; 3 has no out-links: its mass must redistribute,
    // not vanish (without dangling handling the total decays by d
    // per round)
    val r = ranksOf(Seq((1L, 3L), (2L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"rank mass leaked: ${r.values.sum}")
    assert(r(3L) > r(1L) && r(3L) > r(2L))
    assert(math.abs(r(1L) - r(2L)) < 1e-12, "symmetric feeders rank equally")
  }

  test("the hub of a star collects the most rank") {
    val spokes = (2L to 6L)
    val edges = spokes.flatMap(s => Seq((s, 1L), (1L, s)))
    val r = ranksOf(edges)
    assert(spokes.forall(s => r(1L) > r(s)), "hub must outrank every spoke")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(spokes.map(r).distinct.size === 1, "identical spokes rank identically")
  }

  test("L1-delta early stop converges to the full-iteration fixed point") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val full = PageRank.ranks(edges, iters = 80)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val early = PageRank.ranks(edges, iters = 80, tol = Some(1e-12))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    full.foreach { case (id, r) =>
      assert(math.abs(early(id) - r) < 1e-9,
        s"node $id: early-stopped rank ${early(id)} vs full $r")
    }
    assert(math.abs(early.values.sum - 1.0) < 1e-9)
  }

  test("an empty edge list fails fast instead of producing Infinity ranks") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException](PageRank.ranks(empty))
    assert(ex.getMessage.contains("empty graph"))
  }

  test("known 3-node chain matches the analytic solution") {
    // 1 -> 2 -> 3, 3 dangling. Solved analytically for d = 0.85, n = 3:
    // r1 = (1-d)/3 + d*m/3; r2 = (1-d)/3 + d*(r1 + m/3); r3 = (1-d)/3 + d*(r2 + m/3)
    // with m = r3 at the fixed point.
    val r = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 80)
    val d = 0.85
    def step(m: Double): (Double, Double, Double) = {
      val r1 = (1 - d) / 3 + d * m / 3
      val r2 = (1 - d) / 3 + d * (r1 + m / 3)
      val r3 = (1 - d) / 3 + d * (r2 + m / 3)
      (r1, r2, r3)
    }
    var m = 1.0 / 3
    (1 to 200).foreach(_ => m = step(m)._3)
    val (e1, e2, e3) = step(m)
    assert(math.abs(r(1L) - e1) < 1e-9, s"${r(1L)} vs $e1")
    assert(math.abs(r(2L) - e2) < 1e-9, s"${r(2L)} vs $e2")
    assert(math.abs(r(3L) - e3) < 1e-9, s"${r(3L)} vs $e3")
  }
}
