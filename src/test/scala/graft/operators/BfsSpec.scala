package graft.operators

import graft.SparkSpec

/** Bfs: hand-checkable fixed points, multi-source minima, cycle
  * safety, unreachable exclusion, and the non-convergence fail-fast.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], sources: Seq[Long], maxIter: Int = 50): Map[Long, Long] =
    Bfs.hopDistances(
        edges.toDF("src", "dst"), sources.toDF("id"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain distances are the hop index; off-chain node unreached") {
    val d = dists(Seq((0L, 1L), (1L, 2L), (2L, 3L), (7L, 8L)), Seq(0L))
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("diamond takes the shorter path; back-edge cycle terminates") {
    // 0→1→3, 0→2→4→3 (3 via the short arm), 3→0 closes a cycle
    val d = dists(Seq((0L, 1L), (1L, 3L), (0L, 2L), (2L, 4L), (4L, 3L), (3L, 0L)), Seq(0L))
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("multi-source takes the nearest source; direction respected") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L))
    val d = dists(chain, Seq(0L, 10L))
    assert(d(3L) == 1L && d(4L) == 2L && d(1L) == 1L && d(10L) == 0L)
    assert(!d.contains(5L)) // nothing below a source against edge direction
  }

  test("source with no out-edges settles alone") {
    val d = dists(Seq((1L, 2L)), Seq(5L))
    assert(d == Map(5L -> 0L))
  }

  test("fails fast when maxIter leaves a non-empty frontier") {
    val e = intercept[IllegalStateException](
      dists(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq(0L), maxIter = 2))
    assert(e.getMessage.contains("raise maxIter"))
  }

  test("string ids fail loudly instead of silently dropping every edge") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      Bfs.hopDistances(edges, Seq(0L).toDF("id")))
    assert(e.getMessage.contains("integral"))
  }
}
