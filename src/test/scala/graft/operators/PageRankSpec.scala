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

  // ---- ranksScaled: the exact-integer, oracle-portable tier ----

  /** Sequential reference replay of the integer recurrence. */
  private def scaledRef(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> scale).toMap
    val teleport = (15L * scale) / 100L
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val dShare = dangling / n
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v => v -> (teleport + (85L * (contrib.getOrElse(v, 0L) + dShare)) / 100L)).toMap
    }
    r
  }

  private def scaledOf(edges: Seq[(Long, Long)], iters: Int,
                       parts: Int = 4): Map[Long, Long] =
    PageRank.ranksScaled(edges.toDF("src", "dst").repartition(parts), iters = iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("ranksScaled matches the sequential integer replay on a mixed graph") {
    // cycle + chord + dangling sink + a multi-edge (multigraph semantics)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L),
      (5L, 4L), (5L, 4L), (2L, 5L))
    val got = scaledOf(edges, iters = 5)
    val want = scaledRef(edges, iters = 5)
    assert(got === want)
  }

  test("ranksScaled is partition-invariant bit-for-bit") {
    val edges = (0L until 60L).flatMap(i => Seq((i, (i * 7 + 1) % 60), (i, (i * 3 + 2) % 60)))
    assert(scaledOf(edges, iters = 4, parts = 1) === scaledOf(edges, iters = 4, parts = 13))
  }

  test("a ring graph is an exact integer fixed point: every rank stays at scale") {
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
    val r = scaledOf(ring, iters = 6)
    assert(r.values.forall(_ == 1000000000000L), s"ring drifted: ${r.values.toSet}")
  }

  test("scaled ranks track the double fixed point within floor-loss tolerance") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 4L))
    val dbl = PageRank.ranks(edges.toDF("src", "dst"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = dbl.size
    val scl = scaledOf(edges, iters = 12)
    scl.foreach { case (id, v) =>
      // scaled units: rank_double * n * scale (r0 = scale ≙ 1/n each)
      val expect = dbl(id) * n * 1e12
      assert(math.abs(v - expect) / expect < 1e-6,
        s"node $id: scaled $v vs double-implied $expect")
    }
  }

  test("integer floor loss is bounded: total mass within n*(dampDen+1) of n*scale") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L), (1L, 4L), (6L, 2L))
    val r = scaledOf(edges, iters = 8)
    val n = r.size.toLong
    val total = r.values.sum
    // each round floors at most dampDen-1 units per node (share, damp
    // and dangling divisions), but teleport replenishes: the steady
    // state stays within one round's loss of full mass
    assert(total <= n * 1000000000000L, s"mass created: $total")
    assert(total >= n * (1000000000000L - 8 * 300L), s"mass leaked beyond bound: $total")
  }

  test("ranksScaled rejects an overflow-prone scale instead of wrapping") {
    val edges = (0L until 4L).map(i => (i, (i + 1) % 4))
    val ex = intercept[IllegalArgumentException](
      PageRank.ranksScaled(edges.toDF("src", "dst"), scale = Long.MaxValue / 4))
    assert(ex.getMessage.contains("overflow"))
  }

  // ---- personalizedScaled: the TrustRank shape ----

  /** Driver-side sequential replay of the documented recurrence. */
  private def refPersonalized(edges: Seq[(Long, Long)], seeds: Set[Long],
                              iters: Int, scale: Long = 1000000000000L)
      : Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val inSeeds = nodes.filter(seeds).toSet
    val s = inSeeds.size
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val teleport = (15L * scale) / 100L
    var r = nodes.map(v => v -> (if (inSeeds(v)) scale else 0L)).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filter(v => !deg.contains(v)).map(r).sum
      val ds = dangling / s
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) / deg(e._1)).sum
      }
      r = nodes.map { v =>
        val c = contrib.getOrElse(v, 0L)
        v -> (if (inSeeds(v)) teleport + (85L * (c + ds)) / 100L
              else (85L * c) / 100L)
      }.toMap
    }
    r
  }

  private def personalizedOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
                             iters: Int, parts: Int = 1): Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    PageRank.personalizedScaled(
      edges.toDF("src", "dst").repartition(parts), seeds.toDF("id"), iters = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
  }

  test("personalized: matches the sequential replay bit-for-bit (dangling + multigraph)") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L),
      (5L, 3L), (2L, 6L), (7L, 1L), (1L, 3L))
    val seeds = Seq(1L, 4L, 99L) // 99 not in the graph: must be ignored
    (1 to 4).foreach { k =>
      val want = refPersonalized(edges, Set(1L, 4L), k)
      val got = personalizedOf(edges, seeds, iters = k)
      want.foreach { case (id, r) =>
        assert(got(id)._1 === r, s"iters=$k node $id: got ${got(id)._1}, want $r")
      }
      assert(got(1L)._2 && got(4L)._2 && !got(2L)._2)
    }
  }

  test("personalized: nodes unreachable from the seeds hold rank 0") {
    // component {1,2} seeded; component {10,11} has no path from seeds
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val r = personalizedOf(edges, Seq(1L), iters = 6)
    assert(r(10L)._1 === 0L && r(11L)._1 === 0L, "no teleport, no inflow: zero")
    assert(r(1L)._1 > 0L && r(2L)._1 > 0L)
  }

  test("personalized: bit-exact partition invariance") {
    val edges = (0L until 150L).flatMap(i => Seq((i, (i * 11 + 1) % 60), (i % 40, i % 60)))
    val seeds = (0L until 150L by 13).toSeq
    assert(personalizedOf(edges, seeds, iters = 3, parts = 1) ===
      personalizedOf(edges, seeds, iters = 3, parts = 11))
  }

  test("personalized: an empty seed intersection fails fast") {
    val edges = Seq((1L, 2L))
    import spark.implicits._
    val ex = intercept[IllegalArgumentException](
      PageRank.personalizedScaled(edges.toDF("src", "dst"), Seq(42L).toDF("id")))
    assert(ex.getMessage.contains("seed"))
  }
}
