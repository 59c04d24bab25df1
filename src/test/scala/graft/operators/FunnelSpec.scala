package graft.operators

import graft.SparkSpec

/** Funnel — order sensitivity, determinism under ties, step config. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def depth(evs: Seq[(Long, Long, Long, String)]) =
    Funnel.depth(evs.toDF("user_id", "ts", "eid", "et"),
      "user_id", "ts", "eid", "et", Steps)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("order matters: purchase before first view does not convert") {
    val v = depth(Seq(
      // user 1: purchase first, then view, click — stage stops at 2
      (1L, 10L, 1L, "purchase"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "click"),
      // user 2: full ordered funnel with noise between steps
      (2L, 10L, 4L, "view"), (2L, 15L, 5L, "error"), (2L, 20L, 6L, "click"),
      (2L, 25L, 7L, "signup"), (2L, 30L, 8L, "purchase"),
      // user 3: never views
      (3L, 10L, 9L, "click"), (3L, 20L, 10L, "purchase")))
    assert(v(1L).getAs[Long]("funnel_stage") === 2L)
    assert(!v(1L).getAs[Boolean]("converted"))
    assert(v(2L).getAs[Long]("funnel_stage") === 3L)
    assert(v(2L).getAs[Boolean]("converted"))
    assert(v(3L).getAs[Long]("funnel_stage") === 0L)
  }

  test("a repeated step does not advance the automaton twice") {
    val v = depth(Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "view")))
    assert(v(1L).getAs[Long]("funnel_stage") === 1L)
    assert(v(1L).getAs[Long]("n_events") === 3L)
  }

  test("timestamp ties are broken deterministically by the tiebreak id") {
    // same ts: order is (ts, eid), so view(eid=1) precedes click(eid=2)
    // → converted; with the reverse tiebreak the click would be missed
    val v = depth(Seq(
      (1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"), (1L, 20L, 3L, "purchase")))
    assert(v(1L).getAs[Long]("funnel_stage") === 3L)
    val v2 = depth(Seq(
      (2L, 10L, 2L, "view"), (2L, 10L, 1L, "click"), (2L, 20L, 3L, "purchase")))
    assert(v2(2L).getAs[Long]("funnel_stage") === 1L,
      "click sorted before view by (ts, eid) must not count")
  }

  test("custom step sequences work") {
    val v = Funnel.depth(
      Seq((1L, 1L, 1L, "signup"), (1L, 2L, 2L, "purchase"))
        .toDF("user_id", "ts", "eid", "et"),
      "user_id", "ts", "eid", "et", Seq("signup", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(v(1L).getAs[Long]("funnel_stage") === 2L)
    assert(v(1L).getAs[Boolean]("converted"))
  }
}
