package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SortedNeighborhood: brute-force rank-window parity, window edges,
  * bucket-boundary coverage, partition invariance.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (10L, "alpha"), (11L, "alphb"), (12L, "alphc"), (13L, "beta"),
    (14L, "beta"), (15L, "gamma"), (16L, "delta"), (17L, "epsilon"),
    (18L, "zeta"), (19L, "eta"), (20L, "theta"))

  private def brute(data: Seq[(Long, String)], w: Int): Set[(Long, Long, Long, Boolean)] = {
    val ranked = data.sortBy(r => (r._2, r._1)).zipWithIndex
    (for {
      ((ia, ka), ra) <- ranked; ((ib, kb), rb) <- ranked
      if rb > ra && rb <= ra + w
    } yield (ia, ib, (rb - ra).toLong, ka == kb)).toSet
  }

  private def run(data: Seq[(Long, String)], w: Int, parts: Int = 4): Set[(Long, Long, Long, Boolean)] =
    SortedNeighborhood.candidates(data.toDF("id", "k").repartition(parts), "id", "k", w)
      .as[(Long, Long, Long, Boolean)].collect().toSet

  test("window 3 matches the brute-force rank window") {
    assert(run(rows, 3) == brute(rows, 3))
    // the same-key pair (13, 14) is adjacent and flagged
    assert(run(rows, 3).contains((13L, 14L, 1L, true)))
  }

  test("window 1 is adjacency only; larger windows nest") {
    val w1 = run(rows, 1); val w2 = run(rows, 2)
    assert(w1 == brute(rows, 1))
    assert(w2 == brute(rows, 2))
    assert(w1.subsetOf(w2))
    assert(w1.forall(_._3 == 1L))
  }

  test("pairs crossing every bucket boundary are found (window does not tile)") {
    // 30 rows, window 4: every consecutive pair must appear no matter
    // where the rank-buckets cut
    val many = (0L until 30L).map(i => (i, f"k$i%03d"))
    val got = run(many, 4, parts = 7)
    assert(got == brute(many, 4))
    (0L until 29L).foreach(i => assert(got.contains((i, i + 1L, 1L, false))))
  }

  test("partition invariance and bad window fail fast") {
    assert(run(rows, 3, parts = 1) == run(rows, 3, parts = 8))
    intercept[IllegalArgumentException](run(rows, 0))
  }
}
