package graft.operators

import graft.SparkSpec

/** Intervals.coalesceIntervals: merge semantics (overlap, touch,
  * containment, chains), key isolation, partition invariance.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], parts: Int = 4): Set[(Long, Long, Long, Long)] =
    Intervals.coalesceIntervals(
        rows.toDF("k", "s", "e").repartition(parts), "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("overlap, touch, and containment all merge; gaps split") {
    val rows = Seq(
      (1L, 0L, 5L), (1L, 3L, 8L),   // overlap → [0,8]
      (1L, 8L, 10L),                // touching → extends to [0,10]
      (1L, 12L, 20L), (1L, 14L, 15L), // containment inside [12,20]
      (1L, 25L, 30L))               // gap → own island
    assert(run(rows) == Set(
      (1L, 0L, 10L, 3L), (1L, 12L, 20L, 2L), (1L, 25L, 30L, 1L)))
  }

  test("a chain where each link only touches its neighbor merges fully") {
    val chain = (0L until 10L).map(i => (7L, i * 5, i * 5 + 5))
    assert(run(chain) == Set((7L, 0L, 50L, 10L)))
  }

  test("keys are isolated; out-of-order input irrelevant; partition invariant") {
    val rows = Seq((1L, 0L, 2L), (2L, 1L, 3L), (1L, 2L, 4L), (2L, 10L, 11L))
    val expect = Set((1L, 0L, 4L, 2L), (2L, 1L, 3L, 1L), (2L, 10L, 11L, 1L))
    assert(run(rows) == expect)
    assert(run(rows.reverse, parts = 1) == expect)
    assert(run(rows, parts = 8) == expect)
  }

  test("an earlier long interval swallows later short ones (running max, not last end)") {
    // [0,100] then [10,20]: the naive lag(e) would open a new island at 30
    val rows = Seq((5L, 0L, 100L), (5L, 10L, 20L), (5L, 30L, 40L))
    assert(run(rows) == Set((5L, 0L, 100L, 3L)))
  }

  test("duplicate intervals count into their island and never split it") {
    // the r13 sf0.1 regression shape: [16,19], [21,26]x2, [26,29],
    // [26,31] — a tie-ordering bug could attach one [21,26] twin to
    // the FIRST island (engines may order window ties differently
    // across two window passes); pre-aggregated duplicates make the
    // sweep order total, so the twins stay together
    val rows = Seq((75L, 16L, 19L), (75L, 21L, 26L), (75L, 21L, 26L),
      (75L, 26L, 29L), (75L, 26L, 31L), (75L, 32L, 33L))
    assert(run(rows) == Set((75L, 16L, 19L, 1L), (75L, 21L, 31L, 4L), (75L, 32L, 33L, 1L)))
  }
}
