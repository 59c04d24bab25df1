package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

/** Upsert — merge op verdicts (incl. null values) and SCD2 validity. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge classifies insert/update/delete/carry and applies values") {
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    val upd = Seq(
      (2L, 25L, "b2", false), // update
      (3L, 30L, "c", true),   // delete
      (4L, 40L, "d", false))  // insert
      .toDF("k", "v", "s", "_delete")
    val out = Upsert.merge(base, upd, Seq("k"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("op") === "carry" && out(1L).getAs[Long]("v") === 10L)
    assert(out(2L).getAs[String]("op") === "update" && out(2L).getAs[Long]("v") === 25L)
    assert(out(3L).getAs[String]("op") === "delete")
    assert(out(4L).getAs[String]("op") === "insert" && out(4L).getAs[Long]("v") === 40L)
    assert(out.size === 4, "deletes are retained for audit")
  }

  test("merge presence detection survives null value columns") {
    val base = Seq((1L, Option.empty[Long], "a")).toDF("k", "v", "s")
    val upd = Seq((1L, Option(5L), "a2", false)).toDF("k", "v", "s", "_delete")
    val out = Upsert.merge(base, upd, Seq("k")).collect()
    // a null-valued base row is still an existing row: this must be
    // an update, not an insert
    assert(out.head.getAs[String]("op") === "update")
  }

  test("merge writes a NULL carried by an update row (MERGE semantics, not coalesce)") {
    val base = Seq((1L, Option(10L), "a"), (2L, Option(20L), "b")).toDF("k", "v", "s")
    val upd = Seq((1L, Option.empty[Long], "a2", false)).toDF("k", "v", "s", "_delete")
    val out = Upsert.merge(base, upd, Seq("k"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("op") === "update")
    assert(out(1L).isNullAt(out(1L).fieldIndex("v")),
      "an update that nulls a field must write the null, not retain the base value")
    assert(out(1L).getAs[String]("s") === "a2")
    assert(out(2L).getAs[Long]("v") === 20L, "carry row untouched")
  }

  test("scd2 assigns versions and half-open validity with is_current on the last") {
    val d = (s: String) => Date.valueOf(s)
    val changes = Seq(
      (1L, d("2024-01-01"), 101L, 5L),
      (1L, d("2024-02-01"), 102L, 6L),
      (1L, d("2024-02-01"), 103L, 7L), // same-day tie → orderkey order
      (2L, d("2024-03-01"), 201L, 9L))
      .toDF("k", "dt", "ord", "val")
    val out = Upsert.scd2(changes, Seq("k"), Seq("dt", "ord"))
      .orderBy("k", "version_no").collect()
    assert(out.map(_.getAs[Long]("version_no")).toSeq === Seq(1L, 2L, 3L, 1L))
    assert(out(0).getAs[Date]("valid_to") === d("2024-02-01"))
    assert(out(1).getAs[Date]("valid_to") === d("2024-02-01"), "tie closes at the same date")
    assert(out(2).getAs[Date]("valid_to") === null)
    assert(!out(0).getAs[Boolean]("is_current") && out(2).getAs[Boolean]("is_current"))
    assert(out(3).getAs[Boolean]("is_current"))
  }
}
