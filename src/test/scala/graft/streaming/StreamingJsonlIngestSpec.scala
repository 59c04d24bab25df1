package graft.streaming

import graft.SparkSpec
import graft.sources.Jsonl
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._

/** D35 — streaming JSONL ingest: stream rows ≡ the batch q199 kernel
  * over the same lines, malformed lines quarantined not dropped,
  * per-batch exactly-once landing, second drop appends only its own
  * partition.
  */
class StreamingJsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType)))

  private def lines(ids: Range): Seq[String] = ids.map { i =>
    if (i % 5 == 3) s"""{"id": $i, "lang":""" // truncated: poison line
    else s"""{"id": $i, "lang": "l${i % 3}"}"""
  }

  test("stream ≡ batch kernel; poison lines quarantine; exactly-once landing") {
    val in = Files.createTempDirectory("graft_jlin").toString
    val out = Files.createTempDirectory("graft_jlout").toString
    val cp = Files.createTempDirectory("graft_jlcp").toString

    val drop1 = lines(0 until 20)
    Files.write(Paths.get(in, "a.jsonl"), String.join("\n", drop1: _*).getBytes)
    StreamingJsonlIngest.start(spark, in, schema, out, cp).awaitTermination(60000)

    val landed0 = spark.read.parquet(out)
    assert(landed0.count() === 20, "rows in, rows out — nothing dropped")
    assert(landed0.filter(!$"parse_ok").count() === 4, "every poison line flagged")
    // stream ≡ batch: the same parse kernel over the same lines
    val batchSide = Jsonl.parse(drop1.toDF("line"), "line", schema)
      .select("raw", "parse_ok", "id", "lang")
      .collect().map(_.toSeq).toSet
    val streamSide = landed0.select("raw", "parse_ok", "id", "lang")
      .collect().map(_.toSeq).toSet
    assert(streamSide === batchSide)

    // retry idempotence: re-running batch 0 overwrites its own partition
    val before = landed0.count()
    StreamingJsonlIngest.ingestBatch(drop1.toDF("line"), 0L, schema, out)
    assert(spark.read.parquet(out).count() === before,
      "a retried batch overwrites its own partition, never duplicates")

    // drop 2 appends only its own partition
    Files.write(Paths.get(in, "b.jsonl"),
      String.join("\n", lines(100 until 110): _*).getBytes)
    StreamingJsonlIngest.start(spark, in, schema, out, cp).awaitTermination(60000)
    val landed1 = spark.read.parquet(out)
    assert(landed1.select("batch_no").distinct().count() === 2)
    assert(landed1.filter($"batch_no" === 1L).count() === 10)
    assert(landed1.filter($"batch_no" === 0L).count() === before,
      "the first batch's partition is untouched by the second drop")
  }
}
