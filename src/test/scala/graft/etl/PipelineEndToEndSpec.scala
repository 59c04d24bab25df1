package graft.etl

import graft.SparkSpec
import graft.multimodal.{Tar, TfRecord, Warc, Zip, Zstd}
import graft.streaming.StreamingTfRecordSink
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The whole crawl-to-training path in one test: mixed compressed
  * archives (WARC, zstd tarball, ZIP, an Avro record file, raw text,
  * one corrupt payload) → `Ingest.extractText` → markup strip →
  * `CorpusPipeline.curate` (language/quality/length gates + near-dup
  * collapse) → sharded TFRecord delivery with a manifest — then the
  * shards are read back through the CRC-verified TFRecord decoder
  * and checked against what curation said it kept. This is the
  * composition claim of SURVEY §13 r9d made executable: five payload
  * shapes, one API, model-ready output, corrupt inputs visible and
  * excluded rather than silently lost.
  */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and keeps jumping " * 8

  test("archives in, curated tfrecord shards out, corrupt payloads visible") {
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      // 1: WARC response with markup — survives gates after stripping
      1L -> Warc.encode(Seq(Warc.WarcRecord("response", "http://e2e.test/a", 200,
        "text/html", s"<html><body><p>$goodText</p></body></html>")), gzip = true),
      // 2: zstd tarball, near-dup of doc 1 → collapses to one keeper
      2L -> Zstd.compress(Tar.encode(Seq(
        Tar.TarEntrySpec("d/dup.txt", (goodText + " trailing").getBytes("UTF-8"))))),
      // 3: ZIP with a too-short document → filtered on length
      3L -> Zip.encode(Seq(Zip.ZipEntrySpec("short.txt",
        "too short".getBytes("UTF-8"), deflate = true))),
      // 4: Avro records, distinct good text → kept
      4L -> graft.multimodal.Avro.encode(
        graft.multimodal.Avro.SRecord("D", Vector(
          "id" -> graft.multimodal.Avro.SLong, "text" -> graft.multimodal.Avro.SString)),
        Seq(Seq(9L, "a completely different well formed document about spark " +
          "query planning and shuffle behavior at large scale " * 6))),
      // 5: raw text, non-matching language gate (digits/noise)
      5L -> "0101 1010 0011 1100 0101 1010".getBytes("UTF-8"),
      // 6: corrupt warc → visible invalid marker, never delivered
      6L -> "WARC/1.0\r\nbroken".getBytes("UTF-8"))

    // ---- ingest: archives → per-entry text rows
    val rows = Ingest.extractText(payloads.toDF("doc_id", "payload")).toDF()
    val markers = rows.filter(!col("valid")).select("archive_id").as[Long].collect()
    assert(markers.toSeq === Seq(6L)) // the corrupt payload is visible

    // ---- normalize: strip markup, synthesize stable doc ids
    val docs = rows.filter(col("valid"))
      .withColumn("text", graft.functions.TextFunctions.stripMarkup(col("text")))
      .withColumn("doc_id", col("archive_id") * 100 + crc32(col("entry")) % 100)
      .select("doc_id", "text")

    // ---- curate: gates + near-dup collapse
    val curated = CorpusPipeline.curate(docs,
      CorpusPipeline.Config(minQuality = 0.2, minTokens = 20, dedupJaccard = 0.5))
    val kept = curated.filter(col("keep")).select("doc_id", "text").cache()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // doc 3 (short) and doc 5 (not language-gated english) are gone;
    // docs 1/2 collapsed to ONE keeper; doc 4 kept
    assert(!keptIds.exists(_ / 100 == 3))
    assert(!keptIds.exists(_ / 100 == 5))
    assert(keptIds.count(id => id / 100 == 1 || id / 100 == 2) === 1)
    assert(keptIds.count(_ / 100 == 4) === 1)

    // ---- deliver: sharded TFRecord + manifest (the batch face)
    val base = Files.createTempDirectory("graft_e2e").toString
    val manifest = StreamingTfRecordSink.writeShards(
      kept.as[StreamingTfRecordSink.CuratedDoc], batchId = 0L, s"$base/shards", shards = 2)
    assert(manifest.map(_.n_records).sum === keptIds.size.toLong)

    // ---- the training job's view: decode shards, verify CRCs, compare
    val delivered = StreamingTfRecordSink.readBack(spark, s"$base/shards").toMap
    assert(delivered.keySet === keptIds)
    val keptMap = kept.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    keptIds.foreach(id => assert(delivered(id) === keptMap(id)))
    kept.unpersist()
  }
}
