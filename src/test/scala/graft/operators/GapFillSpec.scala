package graft.operators

import graft.SparkSpec
import java.sql.Date

/** GapFill — spine coverage, LOCF semantics, within-day tie pick. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private val d = (s: String) => Date.valueOf(s)

  private def fill(evs: Seq[(Long, Date, Long, Long, Long)]) =
    GapFill.dailyLocf(evs.toDF("k", "d", "ts", "eid", "v"),
      "k", "d", Seq("ts", "eid"), "v")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r).toMap

  test("gap days appear with zero events and the carried-forward value") {
    val v = fill(Seq(
      (1L, d("2024-01-01"), 100L, 1L, 5L),
      (1L, d("2024-01-04"), 400L, 2L, 9L))) // 3 gap days? no: 02, 03
    assert(v.size === 4, "spine covers every day in [min, max]")
    assert(v((1L, "2024-01-02")).getAs[Long]("n_events") === 0L)
    assert(v((1L, "2024-01-02")).getAs[Boolean]("is_gap"))
    assert(v((1L, "2024-01-02")).getAs[Long]("filled_value") === 5L)
    assert(v((1L, "2024-01-03")).getAs[Long]("filled_value") === 5L)
    assert(v((1L, "2024-01-04")).getAs[Long]("filled_value") === 9L)
    assert(!v((1L, "2024-01-04")).getAs[Boolean]("is_gap"))
  }

  test("the LAST event of a day wins, ties broken by the order columns") {
    val v = fill(Seq(
      (1L, d("2024-01-01"), 100L, 1L, 5L),
      (1L, d("2024-01-01"), 200L, 2L, 7L), // later ts wins
      (1L, d("2024-01-01"), 200L, 3L, 8L), // same ts, higher eid wins
      (1L, d("2024-01-02"), 300L, 4L, 1L)))
    assert(v((1L, "2024-01-01")).getAs[Long]("filled_value") === 8L)
    assert(v((1L, "2024-01-01")).getAs[Long]("n_events") === 3L)
  }

  test("keys fill independently over their own ranges") {
    val v = fill(Seq(
      (1L, d("2024-01-01"), 100L, 1L, 5L),
      (1L, d("2024-01-03"), 300L, 2L, 6L),
      (2L, d("2024-02-10"), 900L, 3L, 42L)))
    assert(v.size === 4, "key 2 contributes a single-day spine")
    assert(v((2L, "2024-02-10")).getAs[Long]("filled_value") === 42L)
    assert(!v.contains((2L, "2024-01-02")), "no cross-key spine bleed")
  }
}
