package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, clique and isolated pair resolve to min-id components") {
    val c = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L),           // triangle
      (20L, 21L)))                                  // pair
    assert(Seq(1L, 2L, 3L, 4L).forall(c(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(c(_) == 10L))
    assert(c(20L) == 20L && c(21L) == 20L)
  }

  test("long chain converges (propagation needs O(diameter) rounds)") {
    val chain = (0L until 15L).map(i => (i, i + 1))
    val c = comps(chain)
    assert((0L to 15L).forall(c(_) == 0L))
  }

  test("star with high-id center adopts the min leaf label") {
    val star = Seq((100L, 1L), (100L, 7L), (100L, 9L))
    val c = comps(star)
    assert(Seq(1L, 7L, 9L, 100L).forall(c(_) == 1L))
  }

  test("non-convergence at maxIter fails loudly instead of returning split groups") {
    // A path graph of diameter 10 cannot reach the min-label fixpoint
    // in 3 rounds; a silent return here would hand dedup several
    // "keepers" for one true component (the round-4 verdict's silent
    // under-merge). The operator must throw, naming the cap.
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge after 3 iterations"))
    // the same graph under a sufficient cap converges fine
    val c = ConnectedComponents.components(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert((0L to 10L).forall(c(_) == 0L))
  }

  test("groups: singletons keep themselves; members point at the keeper") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 5L)).toDF("id_a", "id_b")
    val byId = ConnectedComponents.groups(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("group_id"), r.getAs[Boolean]("is_keeper")))).toMap
    assert(byId(1L) == ((1L, true)))
    assert(byId(2L) == ((2L, true)))
    assert(byId(3L) == ((2L, false)))
    assert(byId(5L) == ((2L, false)))
    assert(byId(4L) == ((4L, true)))
  }
}
