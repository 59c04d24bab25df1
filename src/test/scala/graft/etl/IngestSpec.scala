package graft.etl

import graft.SparkSpec
import graft.multimodal.{Tar, Warc, Zip}

/** Archive → corpus ingestion: content-based routing across all three
  * containers (plain AND gzipped — the ambiguous outer magic case),
  * per-entry rows, UTF-8 repair on the way in, and visible markers
  * for malformed archives.
  */
class IngestSpec extends SparkSpec {

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private val warcBytes = Warc.encode(Seq(
    Warc.WarcRecord("warcinfo", "", 0, "", "sw"),
    Warc.WarcRecord("response", "http://a.test/1", 200, "text/html", "<p>warc one</p>"),
    Warc.WarcRecord("response", "http://a.test/2", 200, "text/html", "<p>warc two</p>")),
    gzip = false)
  private val zipBytes = Zip.encode(Seq(
    Zip.ZipEntrySpec("x.txt", "zip body".getBytes("UTF-8"), deflate = true),
    Zip.ZipEntrySpec("y.txt", "more zip".getBytes("UTF-8"), deflate = false)))
  private val tarBytes = Tar.encode(Seq(
    Tar.TarEntrySpec("d/", Array.emptyByteArray, dir = true),
    Tar.TarEntrySpec("d/f.txt", "tar body".getBytes("UTF-8"))))

  test("content-based routing: warc/zip/tar, plain and gzipped, one row per entry") {
    for ((bytes, fmt, expected) <- Seq(
      (warcBytes, "warc", Seq("http://a.test/1" -> "<p>warc one</p>", "http://a.test/2" -> "<p>warc two</p>")),
      (gz(warcBytes), "warc", Seq("http://a.test/1" -> "<p>warc one</p>", "http://a.test/2" -> "<p>warc two</p>")),
      (zipBytes, "zip", Seq("x.txt" -> "zip body", "y.txt" -> "more zip")),
      (tarBytes, "tar", Seq("d/f.txt" -> "tar body")),
      (gz(tarBytes), "tar", Seq("d/f.txt" -> "tar body")))) {
      val rows = Ingest.extractOne(7L, bytes)
      assert(rows.forall(_.valid), s"$fmt: marker row leaked")
      assert(rows.map(r => r.entry -> r.text) === expected, s"format $fmt")
      assert(rows.forall(_.format == fmt))
      assert(rows.forall(_.n_invalid_utf8 == 0L))
    }
  }

  test("lz4-framed outers route by content like gzip: .tar.lz4 and .warc.lz4") {
    val lz4 = (b: Array[Byte]) => graft.multimodal.Lz4.compressFrame(b)
    val tarRows = Ingest.extractOne(8L, lz4(tarBytes))
    assert(tarRows.map(r => r.format -> r.text) === Seq("tar" -> "tar body"))
    val warcRows = Ingest.extractOne(9L, lz4(warcBytes))
    assert(warcRows.forall(_.format == "warc"))
    assert(warcRows.map(_.text) === Seq("<p>warc one</p>", "<p>warc two</p>"))
  }

  test("zstd-framed outers route by content: .tar.zst and .warc.zst") {
    val zst = (b: Array[Byte]) => graft.multimodal.Zstd.compress(b)
    val tarRows = Ingest.extractOne(10L, zst(tarBytes))
    assert(tarRows.map(r => r.format -> r.text) === Seq("tar" -> "tar body"))
    val zipRows = Ingest.extractOne(11L, zst(zipBytes))
    assert(zipRows.forall(_.format == "zip"))
    assert(zipRows.map(_.text) === Seq("zip body", "more zip"))
  }

  test("bzip2 outers route by content: .tar.bz2 (the wikipedia-dump shape)") {
    val bz = graft.multimodal.Bzip2.compress(tarBytes)
    val rows = Ingest.extractOne(12L, bz)
    assert(rows.map(r => r.format -> r.text) === Seq("tar" -> "tar body"))
  }

  test("xz outers route by content: .tar.xz") {
    val xz = graft.multimodal.Xz.compress(tarBytes)
    val rows = Ingest.extractOne(13L, xz)
    assert(rows.map(r => r.format -> r.text) === Seq("tar" -> "tar body"))
  }

  test("the standard one-member-per-record warc.gz routes as WARC") {
    val wgz = Warc.encode(Seq(
      Warc.WarcRecord("response", "http://b.test", 200, "text/html", "member layout")), gzip = true)
    val rows = Ingest.extractOne(1L, wgz)
    assert(rows.map(_.text) === Seq("member layout"))
    assert(rows.head.format === "warc")
  }

  test("raw text payloads pass through with UTF-8 repair counted") {
    val bad = "clean ".getBytes("UTF-8") ++ Array(0x80.toByte) ++ " tail".getBytes("UTF-8")
    val rows = Ingest.extractOne(2L, bad)
    assert(rows.length === 1)
    assert(rows.head.format === "raw")
    assert(rows.head.n_invalid_utf8 === 1L)
    assert(rows.head.text === "clean � tail")
  }

  test("malformed archives yield a visible invalid marker, not silence") {
    val truncated = java.util.Arrays.copyOf(zipBytes, zipBytes.length / 2)
    // a half zip usually loses the EOCD → routes as zip magic but
    // extracts nothing → one marker row
    val rows = Ingest.extractOne(3L, truncated)
    assert(rows.length === 1)
    assert(!rows.head.valid)
    val empty = Ingest.extractOne(4L, Array.emptyByteArray)
    assert(empty.length === 1 && !empty.head.valid)
  }

  test("the Dataset face fans archives out to entry rows") {
    import spark.implicits._
    val df = Seq((1L, warcBytes), (2L, zipBytes), (3L, tarBytes)).toDF("doc_id", "payload")
    val out = Ingest.extractText(df).collect()
    assert(out.count(_.format == "warc") === 2)
    assert(out.count(_.format == "zip") === 2)
    assert(out.count(_.format == "tar") === 1)
    assert(out.forall(_.valid))
  }
}
