package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based robustness for the warehouse/analytics operators
  * (fixed-seed raw ScalaCheck, one Spark job per property): arbitrary
  * event soups and change batches must never throw and must keep
  * their structural invariants.
  */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).toSeq)

  private val event: Gen[(Long, Long, Long, String)] = for {
    k <- Gen.chooseNum(1L, 9L)
    ts <- Gen.chooseNum(0L, 1000L)
    t <- Gen.oneOf("view", "click", "purchase", "error", "signup", "", "VIEW", "??")
  } yield (k, ts, 0L, t) // eid assigned below for uniqueness

  test("funnel invariants hold on arbitrary event soups") {
    val evs = samples(event, 400).zipWithIndex
      .map { case ((k, ts, _, t), i) => (k, ts, i.toLong, t) }
      .toDF("k", "ts", "eid", "et")
    val steps = Seq("view", "click", "purchase")
    val out = Funnel.depth(evs, "k", "ts", "eid", "et", steps).collect()
    assert(out.nonEmpty)
    val totalEvents = out.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents === 400L, "every event counted exactly once")
    out.foreach { r =>
      val stage = r.getAs[Long]("funnel_stage")
      assert(stage >= 0 && stage <= steps.length, s"stage $stage out of range")
      assert((stage == steps.length) === r.getAs[Boolean]("converted"))
      // stages are case-sensitive exact matches: "VIEW"/"??" never advance
    }
  }

  test("gap-fill invariants hold on arbitrary event soups") {
    val base = java.sql.Date.valueOf("2024-01-01").toLocalDate
    val evs = samples(event, 300).zipWithIndex
      .map { case ((k, ts, _, _), i) =>
        (k, java.sql.Date.valueOf(base.plusDays(ts % 40)), ts, i.toLong, ts * 7 % 100) }
      .toDF("k", "d", "ts", "eid", "v")
    val out = GapFill.dailyLocf(evs, "k", "d", Seq("ts", "eid"), "v").collect()
    val byKey = out.groupBy(_.getAs[Long]("k"))
    byKey.foreach { case (k, rows) =>
      val days = rows.map(_.getAs[java.sql.Date]("d").toLocalDate).sortBy(_.toEpochDay)
      // spine is dense: every day between min and max present exactly once
      assert(days.distinct.length === days.length, s"key $k: duplicate spine days")
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 === days.length,
        s"key $k: spine has holes")
      // non-gap days carry events; every row after the first active day has a value
      rows.sortBy(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay).foreach { r =>
        if (!r.getAs[Boolean]("is_gap")) assert(r.getAs[Long]("n_events") > 0)
        assert(!r.isNullAt(r.fieldIndex("filled_value")),
          "spine starts at the first ACTIVE day, so LOCF never sees a leading null")
      }
    }
    val activeDays = out.count(!_.getAs[Boolean]("is_gap"))
    val distinctKeyDays = evs.select("k", "d").distinct().count()
    assert(activeDays.toLong === distinctKeyDays, "active spine days == observed (key, day) pairs")
  }

  test("reconcile diff is symmetric-safe on arbitrary mutations") {
    val rows = samples(Gen.zip(Gen.chooseNum(1L, 500L), Gen.alphaStr), 300)
      .zipWithIndex.map { case ((v, s), i) => (i.toLong, v, s) }
    val a = rows.toDF("k", "v", "s")
    // mutate ~10% of rows deterministically
    val b = rows.map { case (k, v, s) => if (k % 10 == 0) (k, v + 1, s) else (k, v, s) }
      .toDF("k", "v", "s")
    val d = Reconcile.diff(a, b, "k", Seq("k", "v", "s"), buckets = 8).collect()
    assert(d.map(_.getAs[Long]("n_a")).sum === 300L)
    assert(d.map(_.getAs[Long]("n_b")).sum === 300L)
    // identical direction: diff(b, a) flags exactly the same buckets
    val d2 = Reconcile.diff(b, a, "k", Seq("k", "v", "s"), buckets = 8).collect()
    val bad1 = d.filter(!_.getAs[Boolean]("matches")).map(_.getAs[Long]("bucket")).sorted
    val bad2 = d2.filter(!_.getAs[Boolean]("matches")).map(_.getAs[Long]("bucket")).sorted
    assert(bad1.sameElements(bad2), "mismatch detection must be direction-independent")
    assert(bad1.nonEmpty, "planted mutations must be detected")
  }
}
