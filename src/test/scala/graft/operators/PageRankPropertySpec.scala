package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parity for the exact-integer PageRank (fixed-seed
  * raw ScalaCheck, the EvalPropertySpec pattern): on arbitrary random
  * directed multigraphs — self-loop-free but with duplicate edges,
  * dangling nodes and disconnected pieces — `ranksScaled` must equal
  * the sequential replay of the integer recurrence bit-for-bit, at
  * varying partition counts, and conserve bounded total mass.
  */
class PageRankPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)).toSeq)

  /** Random edge over a small node domain → duplicates and dangling
    * nodes arise naturally; self-loops filtered (the operator keeps
    * them, but the fixtures deflect them — either way replay parity
    * is what matters, so keep the generator simple).
    */
  private def edgeGen(nodes: Int): Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, nodes - 1L)
    b <- Gen.chooseNum(0L, nodes - 1L) if a != b
  } yield (a, b)

  /** Sequential replay of the documented integer recurrence. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> Scale).toMap
    val teleport = (15L * Scale) / 100L
    (1 to iters).foreach { _ =>
      val dShare = nodes.filterNot(deg.contains).map(r).sum / n
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v =>
        v -> (teleport + (85L * (contrib.getOrElse(v, 0L) + dShare)) / 100L)).toMap
    }
    r
  }

  test("ranksScaled equals the sequential replay on arbitrary multigraphs") {
    (1 to 6).foreach { round =>
      val edges = samples(edgeGen(8 + round * 3), 15 + round * 9, seed = round * 5000L)
      if (edges.nonEmpty) {
        val iters = 1 + round % 4
        val got = PageRank.ranksScaled(
          edges.toDF("src", "dst").repartition(1 + round % 6), iters = iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === ref(edges, iters), s"round $round (iters=$iters)")
      }
    }
  }

  test("total mass stays bounded: never above n*scale, floor loss bounded per round") {
    (1 to 4).foreach { round =>
      val edges = samples(edgeGen(12), 40, seed = 777000L + round * 1000L)
      if (edges.nonEmpty) {
        val iters = 6
        val ranks = PageRank.ranksScaled(edges.toDF("src", "dst"), iters = iters)
          .collect().map(_.getLong(1))
        val n = ranks.length.toLong
        val total = ranks.sum
        assert(total <= n * Scale, s"round $round: mass created ($total > ${n * Scale})")
        // per round each node's update floors at most 3 divisions of
        // denominator <= 100 plus the dangling share remainder < n
        assert(total >= n * Scale - iters * n * (3 * 100 + n),
          s"round $round: mass leaked beyond the floor bound ($total)")
        assert(ranks.forall(_ >= (15L * Scale) / 100L),
          "every node keeps at least the teleport mass")
      }
    }
  }
}
