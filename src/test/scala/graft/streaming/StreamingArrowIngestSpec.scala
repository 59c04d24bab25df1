package graft.streaming

import graft.SparkSpec
import graft.sources.ArrowIpc
import graft.sources.ArrowIpc._
import java.nio.file.{Files, Paths}

/** D33 — streaming Arrow ingest: stream rows ≡ batch decode of the
  * same files, invalid payloads quarantined not dropped, per-batch
  * exactly-once landing, second drop appends only its own partition.
  */
class StreamingArrowIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema3 = Seq(
    Col("a", I64, nullable = true),
    Col("x", F64, nullable = true),
    Col("s", Str, nullable = true))

  private def arrowFile(id: Long): Array[Byte] = {
    val batches = (0 until (1 + id % 2).toInt).map { b =>
      val n = (2 + (id + b) % 3).toInt
      Seq(
        (0 until n).map(i => if ((i + id) % 4 == 0) None
          else Some((id * 10 + b * 5 + i): Any)): IndexedSeq[Option[Any]],
        (0 until n).map(i => Some((i * 0.25 + id): Any)): IndexedSeq[Option[Any]],
        (0 until n).map(i => Some(s"r$id-$b-$i": Any)): IndexedSeq[Option[Any]])
    }
    ArrowIpc.encode(schema3, batches)
  }

  test("stream rows equal the batch decode; invalid files quarantine; exactly-once") {
    val in = Files.createTempDirectory("graft_arin").toString
    val out = Files.createTempDirectory("graft_arout").toString
    val cp = Files.createTempDirectory("graft_arcp").toString

    // drop 1: two good files + one garbage payload
    Files.write(Paths.get(in, "f0.arrow"), arrowFile(0L))
    Files.write(Paths.get(in, "f1.arrow"), arrowFile(1L))
    Files.write(Paths.get(in, "bad.arrow"), "not an arrow file".getBytes)
    StreamingArrowIngest.start(spark, in, out, cp).awaitTermination(60000)

    val landed0 = spark.read.parquet(out)
    assert(landed0.select("batch_no").distinct().count() === 1)
    val bad = landed0.filter(!$"valid").collect()
    assert(bad.length === 1 && bad.head.getAs[String]("path").endsWith("bad.arrow"),
      "garbage payload lands flagged, not dropped")
    // stream ≡ batch: the same decode kernel over the same bytes
    val batchSide = StreamingArrowIngest.decodeBatch(
      Seq(("f0", Files.readAllBytes(Paths.get(in, "f0.arrow"))),
        ("f1", Files.readAllBytes(Paths.get(in, "f1.arrow"))))
        .toDF("path", "content"))
      .select("batch_idx", "row_idx", "a", "x", "s")
      .collect().map(_.toSeq).toSet
    val streamSide = landed0.filter($"valid")
      .select("batch_idx", "row_idx", "a", "x", "s")
      .collect().map(_.toSeq).toSet
    assert(streamSide === batchSide)
    // capture batch-0 counts BEFORE the rewrite below invalidates the
    // lazy file listing
    val b0Valid = landed0.filter($"valid").count()
    val b0Total = landed0.count()
    // retry idempotence: rewriting batch 0's partition leaves one copy
    StreamingArrowIngest.ingestBatch(
      spark.read.format("binaryFile").option("pathGlobFilter", "*.arrow").load(in)
        .select($"path", $"content"), 0L, out)
    assert(spark.read.parquet(out).filter($"valid").count() === b0Valid,
      "a retried batch overwrites its own partition, never duplicates")

    // drop 2 appends only its own partition
    Files.write(Paths.get(in, "f2.arrow"), arrowFile(7L))
    StreamingArrowIngest.start(spark, in, out, cp).awaitTermination(60000)
    val landed1 = spark.read.parquet(out)
    assert(landed1.select("batch_no").distinct().count() === 2)
    val expected2 = ArrowIpc.decode(arrowFile(7L)).get.nRows
    assert(landed1.filter($"batch_no" === 1L).count() === expected2)
    assert(landed1.filter($"batch_no" === 0L).count() === b0Total,
      "the first batch's partition is untouched by the second drop")
  }
}
