package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** D25 — streaming TFRecord delivery: two drops across a cold
  * restart produce shards whose decoded union equals the input
  * exactly (through the CRC-verified TFRecord reader), the manifest
  * accounts for every shard byte, and re-delivering a batch's
  * shards is byte-identical (the idempotency contract).
  */
class StreamingTfRecordSinkSpec extends SparkSpec {

  private def jsonl(rows: Seq[(Long, String)]): String =
    rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }.mkString("\n")

  test("delivered shards decode back to the exact corpus; manifest accounts for them") {
    val base = Files.createTempDirectory("graft_tfsink").toString
    val in = s"$base/in"; val shards = s"$base/shards"
    val manifest = s"$base/manifest"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))

    val batch1 = (0L until 37L).map(i => i -> s"curated document $i")
    val batch2 = (100L until 120L).map(i => i -> s"late document $i")

    def run(tag: String): Unit = {
      val src = spark.readStream.schema("doc_id BIGINT, text STRING").json(in)
      val q = StreamingTfRecordSink.start(src, shards, manifest, ckpt, shards = 3)
      q.awaitTermination()
    }
    Files.writeString(Paths.get(in, "d0.jsonl"), jsonl(batch1))
    run("s1")
    // cold restart, same checkpoint: only the new drop is delivered
    Files.writeString(Paths.get(in, "d1.jsonl"), jsonl(batch2))
    run("s2")

    // decoded union == input (through both verified CRCs)
    val got = StreamingTfRecordSink.readBack(spark, shards).sortBy(_._1)
    assert(got === (batch1 ++ batch2).sortBy(_._1))

    // manifest: every shard present with exact record and byte counts
    val man = spark.read.parquet(manifest)
      .collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("n_records"), r.getAs[Long]("n_bytes")))
      .toSeq.sortBy(_._1)
    assert(man.map(_._2).sum === (batch1.size + batch2.size).toLong)
    man.foreach { case (shard, nRec, nBytes) =>
      val path = Paths.get(shards, shard)
      assert(Files.size(path) === nBytes, shard)
      assert(graft.multimodal.TfRecord.decode(Files.readAllBytes(path)).nRecords === nRec)
    }

    // idempotency: re-writing batch 0's shards yields identical bytes
    import spark.implicits._
    val before = man.filter(_._1.startsWith("part-00000")).map { case (s, _, _) =>
      s -> Files.readAllBytes(Paths.get(shards, s)).toVector
    }
    val redo = batch1.toDF("doc_id", "text").as[StreamingTfRecordSink.CuratedDoc]
    StreamingTfRecordSink.writeShards(redo, 0L, shards, 3) // the foreachBatch retry path
    before.foreach { case (s, bytes) =>
      assert(Files.readAllBytes(Paths.get(shards, s)).toVector === bytes, s"$s changed on retry")
    }
    assert(before.nonEmpty)
  }
}
