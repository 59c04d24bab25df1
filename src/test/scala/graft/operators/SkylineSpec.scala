package graft.operators

import graft.SparkSpec

/** Skyline: brute-force dominance parity, tie retention, anti-chain
  * output, partition invariance of the two-phase scan.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filterNot { a =>
      rows.exists(b => b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3))
    }.toSet

  private def run(rows: Seq[(Long, Long, Long)], parts: Int = 5): Set[(Long, Long, Long)] =
    Skyline.skyline(rows.toDF("id", "x", "y").repartition(parts), "id", Seq("x", "y"))
      .as[(Long, Long, Long)].collect().toSet

  test("hand case: frontier kept, dominated dropped, full ties both kept") {
    val rows = Seq(
      (1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L), // the frontier
      (4L, 6L, 6L), (5L, 9L, 9L),               // dominated by 2
      (6L, 5L, 5L),                             // exact tie of 2 — kept
      (7L, 1L, 9L))                             // exact tie of 1 — kept
    assert(run(rows) == Set((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L), (6L, 5L, 5L), (7L, 1L, 9L)))
  }

  test("matches brute force on a deterministic random cloud; output is an anti-chain") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 400L).map(i => (i, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val got = run(rows)
    assert(got == brute(rows))
    for (a <- got; b <- got if a != b)
      assert(!(b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3)),
        s"$b dominates $a inside the skyline")
  }

  test("one dimension degenerates to the min set; partition invariance") {
    val rows = Seq((1L, 3L, 0L), (2L, 1L, 0L), (3L, 1L, 0L), (4L, 7L, 0L))
    val one = Skyline.skyline(rows.toDF("id", "x", "y"), "id", Seq("x"))
      .as[(Long, Long)].collect().toSet
    assert(one == Set((2L, 1L), (3L, 1L)))
    val cloud = (0L until 300L).map(i => (i, i * 7 % 97, i * 13 % 89))
    assert(run(cloud, parts = 1) == run(cloud, parts = 11))
    intercept[IllegalArgumentException](
      Skyline.skyline(rows.toDF("id", "x", "y"), "id", Seq.empty))
  }
}
