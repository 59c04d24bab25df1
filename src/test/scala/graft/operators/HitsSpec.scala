package graft.operators

import graft.SparkSpec

/** HITS — exact-integer sequential replay, structural fixed points,
  * partition invariance, contract guards.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side sequential replay of the documented recurrence —
    * the independent reference the distributed loop must match
    * bit-for-bit.
    */
  private def reference(edges: Seq[(Long, Long)], scale: Long, iters: Int)
      : Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val araw = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h(e._1)).sum
      }
      val maxA = if (araw.isEmpty) 0L else araw.values.max
      a = araw.map { case (v, x) => v -> (if (maxA == 0) 0L else x * scale / maxA) }
      val hraw = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a.getOrElse(e._2, 0L)).sum
      }
      val maxH = if (hraw.isEmpty) 0L else hraw.values.max
      h = nodes.map(u => u ->
        hraw.get(u).map(x => if (maxH == 0) 0L else x * scale / maxH).getOrElse(0L)).toMap
    }
    nodes.map(u => u -> (h(u), a.getOrElse(u, 0L))).toMap
  }

  private def run(edges: Seq[(Long, Long)], scale: Long = 1000000L,
                  iters: Int = 5, parts: Int = 1): Map[Long, (Long, Long, Long, Long)] =
    Hits.scoresScaled(edges.toDF("src", "dst").repartition(parts), iters = iters, scale = scale)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("star graph: spokes are pure hubs, the center is the pure authority") {
    val edges = (2L to 6L).map(s => (s, 1L))
    val r = run(edges)
    assert(r(1L)._1 === 0L, "center has no out-links: hub 0")
    assert(r(1L)._2 === 1000000L, "center is the max (only) authority: exactly scale")
    (2L to 6L).foreach { s =>
      assert(r(s)._1 === 1000000L, s"spoke $s is a max hub")
      assert(r(s)._2 === 0L, s"spoke $s has no in-links: authority 0")
    }
    assert(r(1L)._4 === 5L && r(2L)._3 === 1L)
  }

  test("mixed multigraph with dangling nodes matches the sequential replay bit-for-bit") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L),
      (5L, 3L), (2L, 6L), (6L, 2L), (7L, 1L), (1L, 3L))
    val want = reference(edges, 1000000L, 5)
    val got = run(edges)
    want.foreach { case (id, (hw, aw)) =>
      assert(got(id)._1 === hw, s"node $id hub: got ${got(id)._1}, want $hw")
      assert(got(id)._2 === aw, s"node $id auth: got ${got(id)._2}, want $aw")
    }
    // degrees: multigraph edges count with multiplicity
    assert(got(1L)._3 === 3L && got(2L)._4 === 4L)
  }

  test("bit-exact partition invariance") {
    val edges = (0L until 200L).flatMap(i => Seq((i, (i * 7 + 1) % 50), (i % 30, i % 50)))
    val one = run(edges, parts = 1)
    val many = run(edges, parts = 13)
    assert(one === many)
  }

  test("in-edge-free and out-edge-free nodes score zero on the respective side") {
    // 1 -> 2 -> 3: 1 has no in (auth 0), 3 has no out (hub 0)
    val r = run(Seq((1L, 2L), (2L, 3L)))
    assert(r(1L)._2 === 0L && r(3L)._1 === 0L)
    // chain fixed point: hub mass concentrates on 1,2; authority on 2,3
    assert(r(1L)._1 > 0L && r(2L)._2 > 0L && r(3L)._2 > 0L)
  }

  test("round maxima rescale to exactly scale (normalize-by-max contract)") {
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (5L, 2L))
    val r = run(edges, scale = 1000L)
    assert(r.values.map(_._1).max === 1000L, "max hub is exactly scale")
    assert(r.values.map(_._2).max === 1000L, "max authority is exactly scale")
  }

  test("empty edge list fails fast") {
    val ex = intercept[IllegalArgumentException](
      Hits.scoresScaled(Seq.empty[(Long, Long)].toDF("src", "dst")))
    assert(ex.getMessage.contains("empty graph"))
  }

  test("degree*scale^2 overflow fails fast instead of wrapping") {
    val edges = (1L to 4L).map(s => (s, 99L))
    val ex = intercept[IllegalArgumentException](
      Hits.scoresScaled(edges.toDF("src", "dst"), scale = 2000000000L))
    assert(ex.getMessage.contains("overflow"))
  }
}
