package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val trades = Seq(
    (1L, 7L, ts(5)), (2L, 7L, ts(10)), (3L, 7L, ts(30)), (4L, 9L, ts(10))
  ).toDF("trade_id", "sym", "ts")

  private lazy val quotes = Seq(
    (7L, ts(4), 100.0), (7L, ts(10), 105.0), (7L, ts(12), 110.0)
  ).toDF("sym", "ts", "px")

  private lazy val joined = AsOfJoin.backward(trades, quotes, "sym", "ts", Seq("px"))
    .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap

  test("backward match picks latest quote <= trade ts; equal ts matches") {
    assert(joined(1L).contains(100.0)) // 10:05 → quote at 10:04
    assert(joined(2L).contains(105.0)) // exact tie at 10:10 matches
    assert(joined(3L).contains(110.0)) // 10:30 → latest prior 10:12
  }

  test("key with no quotes yields null") {
    assert(joined(4L).isEmpty)
  }

  test("tolerance nulls matches that are too old") {
    val tol = AsOfJoin.backward(trades, quotes, "sym", "ts", Seq("px"),
      tolerance = 5L * 60) // ts compares cast to long = epoch seconds
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(tol(1L).contains(100.0))  // 1 min old
    assert(tol(3L).isEmpty)          // 18 min old > 5 min tolerance
  }
}
