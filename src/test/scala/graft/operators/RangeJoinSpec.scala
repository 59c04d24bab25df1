package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 0L, 100L),     // [0, 100)
    (2L, 50L, 150L),    // overlaps interval 1
    (3L, 400L, 1000L),  // spans many buckets at width 100
    (4L, 500L, 500L),   // degenerate: matches nothing
    (5L, 600L, 550L)    // inverted: matches nothing
  ).toDF("iv_id", "s", "e")

  private def matches(points: Seq[(Long, Long)], width: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points.toDF("p_id", "ts"), intervals, "ts", "s", "e", width)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

  test("inclusive start, exclusive end; overlapping intervals both match") {
    val m = matches(Seq((10L, 0L), (11L, 99L), (12L, 100L), (13L, 75L)), width = 100L)
    assert(m == Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L), (13L, 1L), (13L, 2L)))
  }

  test("interval spanning many buckets matches points in every bucket exactly once") {
    val m = matches(Seq((20L, 401L), (21L, 650L), (22L, 999L), (23L, 1000L)), width = 100L)
    assert(m == Set((20L, 3L), (21L, 3L), (22L, 3L)))
  }

  test("degenerate and inverted intervals match nothing") {
    val m = matches(Seq((30L, 500L), (31L, 560L)), width = 100L)
    assert(m.forall { case (_, iv) => iv != 4L && iv != 5L })
  }

  test("result is identical across bucket widths (width is perf, not semantics)") {
    val pts = (0L until 200L).map(i => (i, i * 7 % 1100))
    assert(matches(pts, 10L) == matches(pts, 1000L))
  }
}
