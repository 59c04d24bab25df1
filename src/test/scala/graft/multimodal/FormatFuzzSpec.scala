package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz for the r9d codec/container family. Contract:
  * these decoders THROW on malformed input (callers map to
  * valid=false), so the fuzz asserts every outcome is either a
  * result or a controlled `Exception` — never an `Error`
  * (OutOfMemory from a crafted length field, StackOverflow) and
  * never a hang; allocation-bomb guards (Snappy's inflation bound,
  * the 256 MB output caps in Lz4/Zstd/Xz/Bzip2, Avro's deflate cap)
  * exist precisely for the crafted-length cases this generates.
  * `Ingest.extractOne` — the face crawl payloads actually hit — is
  * additionally required to never throw at all. Fixed seeds.
  */
class FormatFuzzSpec extends AnyFunSuite {

  private val Rounds = 200

  private def controlled(name: String)(body: => Any): Unit =
    try { body; () } catch {
      case _: Exception => () // controlled rejection
      case e: Error => fail(s"$name: uncontrolled ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def fuzz(name: String, decode: Array[Byte] => Any,
                   valid: Seq[Array[Byte]], magic: Array[Byte]): Unit = {
    val rnd = new scala.util.Random(0xf0042 + name.hashCode)
    for (i <- 0 until Rounds) {
      val n = rnd.nextInt(if (i % 3 == 0) 64 else 4096)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      controlled(name)(decode(b))
    }
    for (_ <- 0 until Rounds) {
      val b = new Array[Byte](magic.length + rnd.nextInt(2048)); rnd.nextBytes(b)
      System.arraycopy(magic, 0, b, 0, magic.length)
      controlled(name)(decode(b))
    }
    valid.foreach { v =>
      for (_ <- 0 until Rounds / 2)
        controlled(name)(decode(java.util.Arrays.copyOf(v, rnd.nextInt(v.length))))
      for (_ <- 0 until Rounds) {
        val b = v.clone()
        for (_ <- 0 to rnd.nextInt(8)) {
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 + rnd.nextInt(255))).toByte
        }
        controlled(name)(decode(b))
      }
    }
  }

  private val text = ("fuzz the ingestion formats " * 120).getBytes("UTF-8")

  test("Snappy.uncompress is bounded and controlled under fuzz") {
    fuzz("snappy", Snappy.uncompress, Seq(Snappy.compress(text)), Array[Byte](42))
  }

  test("Lz4.decompressFrame is bounded and controlled under fuzz") {
    fuzz("lz4", Lz4.decompressFrame,
      Seq(Lz4.compressFrame(text, blockSize = 512, blockChecksum = true)),
      Array[Byte](0x04, 0x22, 0x4d, 0x18))
  }

  test("Zstd.decompress is bounded and controlled under fuzz") {
    fuzz("zstd", Zstd.decompress,
      Seq(Zstd.compress(text, blockSize = 512),
        com.github.luben.zstd.Zstd.compress(text, 3)),
      Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte))
  }

  test("Bzip2.decompress is bounded and controlled under fuzz") {
    fuzz("bzip2", Bzip2.decompress, Seq(Bzip2.compress(text)),
      "BZh5".getBytes("UTF-8"))
  }

  test("Xz.decompress is bounded and controlled under fuzz") {
    val bos = new java.io.ByteArrayOutputStream()
    val xzOut = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options(3))
    xzOut.write(text); xzOut.close()
    fuzz("xz", Xz.decompress, Seq(Xz.compress(text, chunkSize = 512), bos.toByteArray),
      Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0))
  }

  test("Avro.decode and TfRecord.decode are controlled under fuzz") {
    val schema = Avro.SRecord("F", Vector("id" -> Avro.SLong, "t" -> Avro.SString))
    val avro = Avro.encode(schema, (0 until 40).map(i => Seq(i.toLong, s"row $i")), "deflate")
    fuzz("avro", Avro.decode, Seq(avro), Array[Byte]('O', 'b', 'j', 1))
    val tf = TfRecord.encodeFile((0 until 30).map(i =>
      Vector("t" -> TfRecord.BytesF(Vector(s"ex $i".getBytes("UTF-8"))))))
    fuzz("tfrecord", TfRecord.decode, Seq(tf), Array[Byte](12, 0, 0, 0))
  }

  test("Ingest.extractOne never throws on any fuzzed payload") {
    val rnd = new scala.util.Random(0x1276e57)
    val valid = Seq(
      Lz4.compressFrame(Tar.encode(Seq(Tar.TarEntrySpec("a.txt", text)))),
      Zstd.compress(Warc.encode(Seq(
        Warc.WarcRecord("response", "http://f.test", 200, "text/html", "body")), gzip = false)),
      Bzip2.compress(Zip.encode(Seq(Zip.ZipEntrySpec("z.txt", text, deflate = true)))),
      Xz.compress(text))
    for (i <- 0 until 400) {
      val n = rnd.nextInt(4096)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      graft.etl.Ingest.extractOne(i.toLong, b) // must not throw, period
    }
    valid.foreach { v =>
      for (_ <- 0 until 150) {
        val b = v.clone()
        for (_ <- 0 to rnd.nextInt(6)) {
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 + rnd.nextInt(255))).toByte
        }
        graft.etl.Ingest.extractOne(7L, b)
      }
      for (_ <- 0 until 80)
        graft.etl.Ingest.extractOne(8L, java.util.Arrays.copyOf(v, rnd.nextInt(v.length)))
    }
  }
}
