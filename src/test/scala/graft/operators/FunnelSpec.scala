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

  private def wdepth(evs: Seq[(Long, Long, Long, String)], span: Long) =
    Funnel.windowedDepth(evs.toDF("user_id", "ts", "eid", "et"),
      "user_id", "ts", "eid", "et", Steps, span)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("windowedDepth: the chain must complete within maxSpan of ITS first event") {
    val evs = Seq(
      // user 1: whole chain inside the window
      (1L, 0L, 1L, "view"), (1L, 5L, 2L, "click"), (1L, 9L, 3L, "purchase"),
      // user 2: click in window, purchase 11 ticks after the view → stage 2
      (2L, 0L, 4L, "view"), (2L, 5L, 5L, "click"), (2L, 11L, 6L, "purchase"),
      // user 3: click itself already past the window → stage 1
      (3L, 0L, 7L, "view"), (3L, 11L, 8L, "click"), (3L, 12L, 9L, "purchase"))
    val v = wdepth(evs, span = 10L)
    assert(v(1L).getAs[Long]("funnel_stage") === 3L && v(1L).getAs[Boolean]("converted"))
    assert(v(2L).getAs[Long]("funnel_stage") === 2L)
    assert(v(3L).getAs[Long]("funnel_stage") === 1L)
  }

  test("windowedDepth takes the max over chains, not the greedy first chain") {
    // greedy anchors at view ts=0; its purchase lands at 25 — out of
    // window. The LATER chain (view 14 → click 15 → purchase 25) fits.
    val v = wdepth(Seq(
      (1L, 0L, 1L, "view"), (1L, 1L, 2L, "click"),
      (1L, 14L, 3L, "view"), (1L, 15L, 4L, "click"), (1L, 25L, 5L, "purchase")),
      span = 12L)
    assert(v(1L).getAs[Long]("funnel_stage") === 3L,
      "a later in-window chain must rescue the funnel")
  }

  test("windowedDepth: a mid-chain re-anchor uses the NEW chain's window") {
    // view 0 → click 1 (anchor 0); view 8 re-anchors slot 0 but NOT
    // the already-built click chain; purchase 11 is within span of
    // anchor 0? 11-0=11 > 10 → no; there is no click after view 8, so
    // stage stays 2.
    val v = wdepth(Seq(
      (1L, 0L, 1L, "view"), (1L, 1L, 2L, "click"),
      (1L, 8L, 3L, "view"), (1L, 11L, 4L, "purchase")), span = 10L)
    assert(v(1L).getAs[Long]("funnel_stage") === 2L,
      "a re-anchored view without its own click must not extend the old chain")
  }

  test("windowedDepth with an effectively-infinite span equals depth") {
    val evs = Seq(
      (1L, 10L, 1L, "purchase"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "click"),
      (2L, 10L, 4L, "view"), (2L, 20L, 6L, "click"), (2L, 30L, 8L, "purchase"),
      (3L, 10L, 9L, "click"), (3L, 20L, 10L, "purchase"))
    val unwindowed = depth(evs)
    val windowed = wdepth(evs, span = Long.MaxValue / 4)
    unwindowed.foreach { case (u, r) =>
      assert(windowed(u).getAs[Long]("funnel_stage") === r.getAs[Long]("funnel_stage"),
        s"user $u diverged")
    }
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
