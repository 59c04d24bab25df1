package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalAgg — delta-apply ≡ full recompute, including the
  * null-sum bookkeeping and the fail-fast contracts.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def fact(rows: Seq[(String, Option[Long])]): DataFrame =
    rows.toDF("k", "v")

  private def snap(df: DataFrame): Map[String, (Long, Option[Long], Long)] =
    df.collect().map(r => r.getAs[String]("k") ->
      ((r.getAs[Long]("n_rows"),
        Option(r.getAs[java.lang.Long]("sum_v")).map(_.longValue),
        r.getAs[Long]("nn_v")))).toMap

  test("delta-apply equals full recompute (inserts, deletes, update pairs)") {
    val base = fact(Seq("a" -> Some(1L), "a" -> Some(2L), "b" -> Some(10L),
      "b" -> None, "c" -> Some(5L)))
    val view = IncrementalAgg.init(base, Seq("k"), Seq("v"))
    // update a:2→7 (delete+insert), delete c:5, insert d:9
    val delta = Seq(
      ("a", Option(2L), "delete"), ("a", Option(7L), "insert"),
      ("c", Option(5L), "delete"), ("d", Option(9L), "insert"))
      .toDF("k", "v", "_op")
    val out = snap(IncrementalAgg.applyDelta(view, delta, Seq("k"), Seq("v")))
    val post = fact(Seq("a" -> Some(1L), "a" -> Some(7L), "b" -> Some(10L),
      "b" -> None, "d" -> Some(9L)))
    val recomputed = snap(IncrementalAgg.init(post, Seq("k"), Seq("v")))
    assert(out === recomputed)
    assert(out("a") === ((2L, Some(8L), 2L)))
    assert(!out.contains("c"), "count-zero groups are dropped")
  }

  test("sum reverts to NULL when the last non-null value is retracted") {
    val base = fact(Seq("a" -> Some(3L), "a" -> None))
    val view = IncrementalAgg.init(base, Seq("k"), Seq("v"))
    val delta = Seq(("a", Option(3L), "delete")).toDF("k", "v", "_op")
    val out = snap(IncrementalAgg.applyDelta(view, delta, Seq("k"), Seq("v")))
    // one all-null row survives: count 1, sum NULL, non-null count 0 —
    // exactly what a full recompute reports (sum over no non-null
    // input is NULL, not 0)
    assert(out("a") === ((1L, None, 0L)))
  }

  test("a delta driving a group count negative fails fast") {
    val base = fact(Seq("a" -> Some(1L)))
    val view = IncrementalAgg.init(base, Seq("k"), Seq("v"))
    val delta = Seq(("a", Option(1L), "delete"), ("a", Option(2L), "delete"))
      .toDF("k", "v", "_op")
    val e = intercept[Exception] {
      IncrementalAgg.applyDelta(view, delta, Seq("k"), Seq("v")).collect()
    }
    assert(e.getMessage.contains("negative count"))
  }

  test("an op outside insert/delete fails fast") {
    val base = fact(Seq("a" -> Some(1L)))
    val view = IncrementalAgg.init(base, Seq("k"), Seq("v"))
    val delta = Seq(("a", Option(2L), "upsert")).toDF("k", "v", "_op")
    val e = intercept[Exception] {
      IncrementalAgg.applyDelta(view, delta, Seq("k"), Seq("v")).collect()
    }
    assert(e.getMessage.contains("bad _op"))
  }

  test("maintenance is associative: two small deltas equal one combined delta") {
    val base = fact(Seq("a" -> Some(1L), "b" -> Some(2L)))
    val view = IncrementalAgg.init(base, Seq("k"), Seq("v"))
    val d1 = Seq(("a", Option(4L), "insert")).toDF("k", "v", "_op")
    val d2 = Seq(("b", Option(2L), "delete"), ("c", Option(6L), "insert"))
      .toDF("k", "v", "_op")
    val stepwise = snap(IncrementalAgg.applyDelta(
      IncrementalAgg.applyDelta(view, d1, Seq("k"), Seq("v")),
      d2, Seq("k"), Seq("v")))
    val combined = snap(IncrementalAgg.applyDelta(
      view, d1.unionByName(d2), Seq("k"), Seq("v")))
    assert(stepwise === combined)
  }
}
