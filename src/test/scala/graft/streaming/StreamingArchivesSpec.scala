package graft.streaming

import graft.SparkSpec
import graft.etl.Ingest
import graft.multimodal.{Tar, Warc, Zip}
import java.nio.file.{Files, Paths}
import java.util.Base64

/** D24 — streaming archive ingestion: base64 JSONL drops of mixed
  * containers processed across two query restarts (shared
  * checkpoint); output rows must equal the batch `Ingest.extractText`
  * over the same payloads row-for-row, malformed archives included.
  */
class StreamingArchivesSpec extends SparkSpec {
  import spark.implicits._

  private def gz(plain: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(plain); g.close(); bos.toByteArray
  }

  private val payloads: Seq[(Long, Array[Byte])] = Seq(
    1L -> Warc.encode(Seq(
      Warc.WarcRecord("response", "http://a.test/1", 200, "text/html",
        "<html>alpha page</html>")), gzip = true),
    2L -> Zip.encode(Seq(
      Zip.ZipEntrySpec("a.txt", "zip alpha".getBytes("UTF-8"), deflate = true),
      Zip.ZipEntrySpec("b.txt", "zip beta".getBytes("UTF-8"), deflate = false))),
    3L -> gz(Tar.encode(Seq(
      Tar.TarEntrySpec("d/x.txt", "tar content".getBytes("UTF-8"))))),
    4L -> Array[Byte]('r', 'a', 'w', ' ', 0xff.toByte, 'z'), // raw with a bad byte
    5L -> ("WARC/1.0\r\ngarbage" * 3).getBytes("UTF-8"), // malformed → marker row
    6L -> graft.multimodal.Avro.encode( // record format through the same stream
      graft.multimodal.Avro.SRecord("D",
        Vector("id" -> graft.multimodal.Avro.SLong, "text" -> graft.multimodal.Avro.SString)),
      Seq(Seq(1L, "avro record one"), Seq(2L, "avro record two"))),
    7L -> graft.multimodal.Zstd.compress( // zstd outer over a tarball
      Tar.encode(Seq(Tar.TarEntrySpec("z/x.txt", "zstd tar content".getBytes("UTF-8"))))))

  private def drop(dir: String, name: String, rows: Seq[(Long, Array[Byte])]): Unit =
    Files.writeString(Paths.get(dir, name), rows.map { case (id, p) =>
      s"""{"archive_id":$id,"payload_b64":"${Base64.getEncoder.encodeToString(p)}"}"""
    }.mkString("\n"))

  test("stream across a restart equals batch extraction row-for-row") {
    val base = Files.createTempDirectory("graft_stream_archives").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))

    // session 1: first three archives
    drop(in, "d0.jsonl", payloads.take(3))
    val q1 = StreamingArchives.start(StreamingArchives.fromBase64Json(spark, in), out, ckpt)
    q1.awaitTermination()

    // session 2 (cold restart, same checkpoint): remaining archives
    drop(in, "d1.jsonl", payloads.drop(3))
    val q2 = StreamingArchives.start(StreamingArchives.fromBase64Json(spark, in), out, ckpt)
    q2.awaitTermination()

    val got = spark.read.parquet(out)
      .as[Ingest.IngestedDoc].collect()
      .map(d => (d.archive_id, d.format, d.entry, d.text, d.n_invalid_utf8, d.valid))
      .sortBy(r => (r._1, r._3))

    val want = Ingest.extractText(
      payloads.toDF("doc_id", "payload")).collect()
      .map(d => (d.archive_id, d.format, d.entry, d.text, d.n_invalid_utf8, d.valid))
      .sortBy(r => (r._1, r._3))

    assert(got.toSeq === want.toSeq)
    // shape checks: one row per entry, the bad byte counted, the marker visible
    assert(got.count(_._1 == 2L) === 2) // two zip entries
    assert(got.filter(_._1 == 6L).map(_._4) ===
      Seq("avro record one", "avro record two")) // record format rows
    assert(got.find(_._1 == 7L).get._4 === "zstd tar content") // zstd outer
    assert(got.find(_._1 == 4L).get._5 === 1L) // one repaired byte
    val marker = got.find(_._1 == 5L).get
    assert(marker._2 === "warc" && !marker._6)
  }
}
