package graft.operators

import graft.SparkSpec
import graft.operators.SequenceMatch.{Step, One, Opt, Plus, Star}

/** SequenceMatch — quantifier semantics, longest-match greediness,
  * both skip modes, non-symbol interruption, per-key isolation,
  * deterministic ordering, and partition invariance.
  */
class SequenceMatchSpec extends SparkSpec {

  private def run(evs: Seq[(Long, Long, String)], pattern: Seq[Step],
                  skip: Boolean = true): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = evs.map { case (k, id, s) => (k, id, id, s) }
      .toDF("user_id", "event_id", "ts_us", "event_type")
    SequenceMatch.matches(df, "user_id", "event_id", "ts_us", "event_type", pattern, skip)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def seq1(syms: String*): Seq[(Long, Long, String)] =
    syms.zipWithIndex.map { case (s, i) => (1L, i.toLong, s) }

  test("One: exact chain, non-overlapping, skip past last row") {
    val evs = seq1("a", "b", "a", "b", "a")
    val got = run(evs, Seq(Step("a"), Step("b")))
    assert(got === Seq((1L, 1L, 0L, 1L, 2L), (1L, 2L, 2L, 3L, 2L)))
  }

  test("Plus is greedy: consumes the whole run") {
    val evs = seq1("a", "a", "a", "b", "a", "b")
    val got = run(evs, Seq(Step("a", Plus), Step("b")))
    // greedy: first match eats aaa b; second eats a b
    assert(got === Seq((1L, 1L, 0L, 3L, 4L), (1L, 2L, 4L, 5L, 2L)))
  }

  test("Star allows zero; Opt allows zero or one") {
    val evs = seq1("a", "c", "a", "b", "c", "a", "b", "b", "c")
    val got = run(evs, Seq(Step("a"), Step("b", Star), Step("c")))
    assert(got === Seq(
      (1L, 1L, 0L, 1L, 2L),  // a c (zero b)
      (1L, 2L, 2L, 4L, 3L),  // a b c
      (1L, 3L, 5L, 8L, 4L))) // a b b c
    val opt = run(evs, Seq(Step("a"), Step("b", Opt), Step("c")))
    // a b b c cannot match with Opt (at most one b)
    assert(opt === Seq((1L, 1L, 0L, 1L, 2L), (1L, 2L, 2L, 4L, 3L)))
  }

  test("longest match wins over first accept") {
    // pattern a b* : at position 0 the NFA accepts at 'a' already but
    // must keep consuming the b-run
    val evs = seq1("a", "b", "b", "a")
    val got = run(evs, Seq(Step("a"), Step("b", Star)))
    assert(got === Seq((1L, 1L, 0L, 2L, 3L), (1L, 2L, 3L, 3L, 1L)))
  }

  test("foreign symbols break matches and never advance them") {
    val evs = seq1("a", "x", "b", "a", "b")
    val got = run(evs, Seq(Step("a"), Step("b")))
    assert(got === Seq((1L, 1L, 3L, 4L, 2L)))
  }

  test("skipPastLastRow=false allows overlapping starts") {
    val evs = seq1("a", "a", "b")
    val strict = run(evs, Seq(Step("a", Plus), Step("b")))
    assert(strict === Seq((1L, 1L, 0L, 2L, 3L)))
    val overlap = run(evs, Seq(Step("a", Plus), Step("b")), skip = false)
    // attempts at 0 and 1 both reach the b
    assert(overlap === Seq((1L, 1L, 0L, 2L, 3L), (1L, 2L, 1L, 2L, 2L)))
  }

  test("keys are isolated and ordering uses (order, id)") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5L, "a"), (2L, 11L, 6L, "b"), (1L, 12L, 7L, "b"),
      // same order value: id tiebreak puts 20 before 21
      (3L, 21L, 9L, "b"), (3L, 20L, 9L, "a")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val got = SequenceMatch.matches(df, "user_id", "event_id", "ts_us", "event_type",
      Seq(Step("a"), Step("b")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    // key 1: a(10) b(12) matches; key 2 has no a; key 3 matches via tiebreak
    assert(got === Seq((1L, 10L, 12L), (3L, 20L, 21L)))
  }

  test("no empty matches from all-optional patterns") {
    val evs = seq1("x", "x", "a", "x")
    val got = run(evs, Seq(Step("a", Star)))
    assert(got === Seq((1L, 1L, 2L, 2L, 1L)))
  }

  test("partition invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val evs = (0 until 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, i.toLong,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
    }
    val df = evs.toDF("user_id", "event_id", "ts_us", "event_type")
    val pat = Seq(Step("view", Plus), Step("click", Star), Step("purchase"))
    def res(d: org.apache.spark.sql.DataFrame) =
      SequenceMatch.matches(d, "user_id", "event_id", "ts_us", "event_type", pat)
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(res(df).nonEmpty)
    assert(res(df.repartition(7)) === res(df.repartition(1)))
  }

  test("pattern compile guards: length cap and empty pattern") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, "a")).toDF("user_id", "event_id", "ts_us", "event_type")
    intercept[IllegalArgumentException] {
      SequenceMatch.matches(df, "user_id", "event_id", "ts_us", "event_type", Nil)
    }
    intercept[IllegalArgumentException] {
      SequenceMatch.matches(df, "user_id", "event_id", "ts_us", "event_type",
        (1 to 40).map(_ => Step("a", Plus))) // 80 atoms > 62
    }
  }
}
