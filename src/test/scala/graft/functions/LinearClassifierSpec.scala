package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** LinearClassifier — hashed-weight margin arithmetic. */
class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("margin is the exact integer sum of per-token weights, with multiplicity") {
    val df = Seq((1L, "apple banana apple")).toDF("doc_id", "text")
    val Array(row) = df.select(
      LinearClassifier.margin(col("text")).as("m"),
      LinearClassifier.tokenWeight(org.apache.spark.sql.functions.lit("apple")).as("wa"),
      LinearClassifier.tokenWeight(org.apache.spark.sql.functions.lit("banana")).as("wb"))
      .collect()
    assert(row.getAs[Long]("m") === 2 * row.getAs[Long]("wa") + row.getAs[Long]("wb"))
  }

  test("weights land in [-1000, 1000] and are case-insensitive via lower()") {
    val toks = Seq("the", "quick", "brown", "fox", "Zebra", "12345")
    val rows = toks.toDF("t")
      .select(LinearClassifier.tokenWeight(org.apache.spark.sql.functions.lower(col("t"))).as("w"))
      .collect().map(_.getLong(0))
    assert(rows.forall(w => w >= -1000 && w <= 1000))
    val m = Seq((1L, "ZEBRA zebra")).toDF("doc_id", "text")
      .select(LinearClassifier.margin(col("text")).as("m")).head().getLong(0)
    val wz = Seq(("zebra", 1)).toDF("t", "x")
      .select(LinearClassifier.tokenWeight(col("t")).as("w")).head().getLong(0)
    assert(m === 2 * wz, "margin lowercases before hashing")
  }

  test("empty docs score 0 and pass a threshold-0 keep") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val rows = df.select(LinearClassifier.margin(col("text")).as("m"),
      LinearClassifier.keep(col("text")).as("k")).collect()
    assert(rows.forall(r => r.getAs[Long]("m") === 0L && r.getAs[Boolean]("k")))
  }

  test("keep thresholds shift verdicts monotonically") {
    val df = Seq((1L, "some plain words to score here")).toDF("doc_id", "text")
    val m = df.select(LinearClassifier.margin(col("text")).as("m")).head().getLong(0)
    val atM = df.select(LinearClassifier.keep(col("text"), m).as("k")).head().getBoolean(0)
    val aboveM = df.select(LinearClassifier.keep(col("text"), m + 1).as("k")).head().getBoolean(0)
    assert(atM && !aboveM)
  }
}
