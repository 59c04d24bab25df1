package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** JSONL quarantine ingestion — rows in, rows out: malformed lines
  * survive flagged with their raw bytes, good lines parse typed,
  * missing fields are null-but-ok (schema evolution tolerance).
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType),
    StructField("tags", ArrayType(StringType))))

  private def parse(lines: String*) =
    Jsonl.parse(lines.toDF("line"), "line", schema)
      .collect().map(r => r.getAs[String]("raw") -> r).toMap

  test("good lines parse typed; malformed lines are flagged, never dropped") {
    val rows = parse(
      """{"id": 1, "lang": "en", "tags": ["a", "b"]}""",
      """{"id": 2, "lang": "fr"""", // truncated mid-string
      """not json at all""",
      """{"id": 3}""") // missing fields: ok, nulls
    assert(rows.size === 4, "quarantine-not-drop: every line yields a row")
    val good = rows("""{"id": 1, "lang": "en", "tags": ["a", "b"]}""")
    assert(good.getAs[Boolean]("parse_ok"))
    assert(good.getAs[Long]("id") === 1L)
    assert(good.getAs[Seq[String]]("tags") === Seq("a", "b"))
    assert(!rows("""{"id": 2, "lang": "fr"""").getAs[Boolean]("parse_ok"))
    assert(!rows("not json at all").getAs[Boolean]("parse_ok"))
    val missing = rows("""{"id": 3}""")
    assert(missing.getAs[Boolean]("parse_ok"))
    assert(missing.getAs[Long]("id") === 3L)
    assert(missing.getAs[String]("lang") === null)
  }

  test("the reserved corrupt column is rejected in user schemas") {
    val bad = StructType(Seq(StructField("_bad", StringType)))
    intercept[IllegalArgumentException](
      Jsonl.parse(Seq("{}").toDF("line"), "line", bad))
  }

  test("parse is partition-invariant") {
    val lines = (1 to 40).map(i =>
      if (i % 7 == 3) s"""{"id": $i, "lang":""" else s"""{"id": $i, "lang": "l${i % 3}", "tags": []}""")
    val a = Jsonl.parse(lines.toDF("line").repartition(1), "line", schema)
      .orderBy("raw").collect().map(_.toString).toSeq
    val b = Jsonl.parse(lines.toDF("line").repartition(9), "line", schema)
      .orderBy("raw").collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
