package graft.operators

import graft.SparkSpec

/** Hierarchy.bomExplode: hand-checked diamonds, Fibonacci ladder
  * (exponential path counting), parallel-edge summing, cycle
  * fail-fast, unreachable exclusion, partition invariance.
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], root: Long = 0L,
      parts: Int = 4): Map[Long, (Long, Long)] =
    Hierarchy.bomExplode(edges.toDF("parent", "child", "qty").repartition(parts), root)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("diamond: totals sum path products, level is the longest path") {
    // 0→1(×2), 0→2(×3), 1→3(×4), 2→3(×5): total(3) = 2·4 + 3·5 = 23
    val d = run(Seq((0L, 1L, 2L), (0L, 2L, 3L), (1L, 3L, 4L), (2L, 3L, 5L)))
    assert(d == Map(0L -> (0L, 1L), 1L -> (1L, 2L), 2L -> (1L, 3L), 3L -> (2L, 23L)))
  }

  test("uneven-depth diamond: the deep arm sets the level, both arms the total") {
    // 0→1→2→4 and 0→4 directly: level(4) = 3, total(4) = 1·1·1 + 7
    val d = run(Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 4L, 1L), (0L, 4L, 7L)))
    assert(d(4L) == (3L, 8L))
  }

  test("fibonacci ladder counts every path") {
    // edges i→i+1 and i→i+2 (all ×1): total(n) = fib(n+1)
    val n = 12
    val edges = (0 until n).flatMap(i =>
      Seq((i.toLong, i + 1L, 1L)) ++ (if (i + 2 <= n) Seq((i.toLong, i + 2L, 1L)) else Nil))
    val fib = Iterator.iterate((1L, 1L)) { case (a, b) => (b, a + b) }.take(n + 1).toSeq
    val d = run(edges)
    (0 to n).foreach(i => assert(d(i.toLong)._2 == fib(i)._1, s"node $i"))
  }

  test("parallel edges sum; unreachable nodes absent") {
    val d = run(Seq((0L, 1L, 2L), (0L, 1L, 3L), (7L, 8L, 1L)))
    assert(d == Map(0L -> (0L, 1L), 1L -> (1L, 5L)))
  }

  test("a reachable cycle fails fast instead of spinning") {
    val e = intercept[IllegalStateException](
      run(Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 1L)), parts = 2))
    assert(e.getMessage.contains("cycle"))
  }

  test("partition invariance") {
    val edges = (1L until 40L).map(i => (i / 3, i, i % 4 + 1))
    assert(run(edges, parts = 1) == run(edges, parts = 8))
  }

  test("depth-200 chain: pruned pending + stride checkpoints keep the sweep flat") {
    // 0→1→2→…→200, qty 1 everywhere except every 50th edge (×2):
    // level(i) = i, total(i) = 2^(i div 50) — products stay small.
    val n = 200
    val edges = (0 until n).map(i =>
      (i.toLong, i + 1L, if ((i + 1) % 50 == 0) 2L else 1L))
    val df = Hierarchy.bomExplode(
      edges.toDF("parent", "child", "qty").repartition(4), rootId = 0L, maxIter = 210)
    // the assembled output plan must stay LOG-depth in the BOM depth
    // (a left-fold union would nest 200 deep and every optimizer pass
    // would walk it) — the balanced union keeps it ≤ ~2·log2(201)+k
    def planDepth(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      if (p.children.isEmpty) 1
      else 1 + p.children.map(c => planDepth(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max
    assert(planDepth(df.queryExecution.logical) <= 24,
      s"output plan nests ${planDepth(df.queryExecution.logical)} deep — lineage is not flat")
    val d = df.as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(d.size == n + 1)
    (0 to n).foreach { i =>
      assert(d(i.toLong) == (i.toLong, 1L << (i / 50)), s"node $i")
    }
  }

  test("non-integral qty and non-numeric ids fail loudly, never truncate silently") {
    val fractional = Seq((0L, 1L, 2.5)).toDF("parent", "child", "qty")
    val e1 = intercept[IllegalArgumentException](Hierarchy.bomExplode(fractional, rootId = 0L))
    assert(e1.getMessage.contains("integral"))
    val stringIds = Seq(("a", "b", 1L)).toDF("parent", "child", "qty")
    val e2 = intercept[IllegalArgumentException](Hierarchy.bomExplode(stringIds, rootId = 0L))
    assert(e2.getMessage.contains("integral"))
  }
}
