package graft.operators

import graft.SparkSpec

/** LPA — sequential replay of the deterministic synchronous variant,
  * community recovery on planted structure, partition invariance;
  * modularity — brute-force definitional parity, sign behavior,
  * contract guards.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the documented recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = und.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = nodes.map { v =>
        val votes = und.filter(_._2 == v).map(e => labels(e._1))
          .groupBy(identity).map { case (l, g) => (l, g.size) }
        // max count, ties -> smallest label
        v -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }.toMap
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 5, parts: Int = 1): Map[Long, Long] =
    LabelPropagation.propagate(edges.toDF("src", "dst").repartition(parts), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two planted cliques joined by one bridge separate into two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((3L, 10L))
    val r = run(edges, iters = 6)
    assert((0L to 3L).map(r).toSet.size === 1, "clique A converges to one label")
    assert((10L to 13L).map(r).toSet.size === 1, "clique B converges to one label")
    assert(r(0L) !== r(11L), "the bridge does not merge the cliques")
  }

  test("matches the sequential replay bit-for-bit on a noisy multigraph") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L), (3L, 5L), (8L, 1L), (8L, 8L))
    (1 to 4).foreach { k =>
      assert(run(edges, iters = k) === reference(edges, k), s"iters=$k")
    }
  }

  test("bit-exact partition invariance") {
    val edges = (0L until 300L).map(i => (i, (i + 8) % 300)) ++
      (0L until 300L by 17).map(i => (i, (i + 1) % 300))
    assert(run(edges, parts = 1) === run(edges, parts = 13))
  }

  test("empty graph and string ids fail fast") {
    intercept[IllegalArgumentException](
      LabelPropagation.propagate(Seq.empty[(Long, Long)].toDF("src", "dst")))
    intercept[IllegalArgumentException](
      LabelPropagation.propagate(Seq(("a", "b")).toDF("src", "dst")))
  }

  // ---- modularity ----

  /** Textbook Q = Σ_c (e_c/m − (d_c/2m)²) with doubles — the
    * definitional form the integer-numerator chain must agree with.
    */
  private def refModularity(edges: Seq[(Long, Long)], labels: Map[Long, Long]): Double = {
    val e = edges.filter(p => p._1 != p._2)
    val m = e.size.toDouble
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map { case (n, g) => n -> g.size }
    labels.values.toSeq.distinct.map { c =>
      val ec = e.count(p => labels(p._1) == c && labels(p._2) == c)
      val dc = deg.collect { case (n, d) if labels(n) == c => d }.sum.toDouble
      ec / m - (dc / (2 * m)) * (dc / (2 * m))
    }.sum
  }

  private def modOf(edges: Seq[(Long, Long)], labels: Map[Long, Long])
      : (Seq[(Long, Long, Long, Long)], Long, Double) = {
    val rows = LabelPropagation.modularity(
      edges.toDF("src", "dst"), labels.toSeq.toDF("id", "label")).collect()
    (rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
       .sortBy(_._1),
      rows.head.getLong(4), rows.head.getDouble(5))
  }

  test("save/load round-trips the label table; modularity over loaded labels is identical") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L))
    val edf = edges.toDF("src", "dst")
    val fresh = LabelPropagation.propagate(edf, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_lpa_save").toString
    LabelPropagation.save(fresh, dir, buckets = 4)
    val loaded = LabelPropagation.load(spark, dir)
    assert(loaded.as[(Long, Long)].collect().toSet ===
      fresh.as[(Long, Long)].collect().toSet,
      "the persisted table must hold exactly the propagated labels")
    val mFresh = LabelPropagation.modularity(edf, fresh).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("q")).toMap
    val mLoaded = LabelPropagation.modularity(edf, loaded).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("q")).toMap
    assert(mLoaded === mFresh,
      "evaluating from the persisted table must be bit-identical to the in-memory path")
  }

  test("modularity: hand case — two disjoint triangles under their own labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
    val labels = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val (rows, m, q) = modOf(edges, labels)
    assert(m === 6L)
    assert(rows === Seq((1L, 3L, 6L, 3L), (4L, 3L, 6L, 3L)))
    // Q = 2 * (3/6 - (6/12)^2) = 0.5 exactly
    assert(q === 0.5)
    assert(math.abs(q - refModularity(edges, labels)) < 1e-12)
  }

  test("modularity: one-community assignment scores exactly 0; split-everything is negative") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val one = modOf(edges, (1L to 4L).map(_ -> 1L).toMap)
    assert(one._3 === 0.0, "all-in-one: e_c = m and d_c = 2m cancel exactly")
    val split = modOf(edges, (1L to 4L).map(i => i -> i).toMap)
    assert(split._3 < 0.0, "singletons on a connected graph score negative")
    assert(math.abs(split._3 -
      refModularity(edges, (1L to 4L).map(i => i -> i).toMap)) < 1e-12)
  }

  test("modularity: definitional parity on LPA's own output, self-loops dropped") {
    val edges = (0L until 60L).map(i => (i, (i + 6) % 60)) ++
      Seq((0L, 0L), (7L, 7L)) ++ (0L until 60L by 11).map(i => (i, (i + 3) % 60))
    val labels = run(edges.filter(p => p._1 != p._2), iters = 4)
    val (_, m, q) = modOf(edges, labels)
    assert(m === edges.count(p => p._1 != p._2).toLong)
    assert(math.abs(q - refModularity(edges, labels)) < 1e-12)
  }
}
