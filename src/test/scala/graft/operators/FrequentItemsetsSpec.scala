package graft.operators

import graft.SparkSpec

/** FrequentItemsets: brute-force parity, pruning losslessness on a
  * corpus designed so pruning actually fires, threshold edges.
  */
class FrequentItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // (basket, item): items 1,2 co-occur 3×; 1,3 co-occur 2×; item 9
  // appears once (infrequent — A-priori must drop it before pairing);
  // basket 4 repeats (1,2) twice to prove per-basket de-duplication.
  private val rows = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L), (2L, 3L),
    (3L, 1L), (3L, 9L),
    (4L, 1L), (4L, 2L), (4L, 2L), (4L, 1L))

  private def brute(data: Seq[(Long, Long)], s: Long): Set[(Long, Long, Long, Long, Long)] = {
    val sets = data.distinct.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val supp = sets.flatMap(_.toSeq).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val pairs = sets.flatMap(b => for (a <- b.toSeq; c <- b.toSeq if a < c) yield (a, c))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    pairs.collect { case ((a, c), n) if n >= s => (a, c, supp(a), supp(c), n) }.toSet
  }

  private def run(data: Seq[(Long, Long)], s: Long): Set[(Long, Long, Long, Long, Long)] =
    FrequentItemsets.frequentPairs(data.toDF("b", "it"), "b", "it", s)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("matches brute force; duplicate basket rows count once") {
    assert(run(rows, 3L) == brute(rows, 3L))
    assert(run(rows, 3L) == Set((1L, 2L, 4L, 3L, 3L)))
  }

  test("threshold 2 admits the secondary pairs, still brute-equal") {
    val got = run(rows, 2L)
    assert(got == brute(rows, 2L))
    assert(got.map(r => (r._1, r._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("threshold 1 equals unpruned enumeration (worst case)") {
    assert(run(rows, 1L) == brute(rows, 1L))
  }

  test("threshold above max support yields nothing; bad threshold fails fast") {
    assert(run(rows, 10L).isEmpty)
    intercept[IllegalArgumentException](run(rows, 0L))
  }
}
