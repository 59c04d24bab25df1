package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.tukaani.xz.{LZMA2Options, XZInputStream, XZOutputStream}

/** XZ/LZMA2 — container round trips through our writer, the full
  * LZMA core validated by xz-java presets 0–9 in both directions,
  * CRC64 vectors, check-type coverage, malformed set.
  */
class XzSpec extends AnyFunSuite {

  private def mdNoise(n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.io.ByteArrayOutputStream()
    var block = "xz-noise".getBytes("UTF-8")
    while (out.size < n) { block = md.digest(block); out.write(block) }
    out.toByteArray.take(n)
  }

  private val text =
    ("the xz container wraps lzma2 chunks with vli framing and crc layers. " * 400).getBytes("UTF-8")

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "a".getBytes("UTF-8"),
    "lzma range coding sample".getBytes("UTF-8"),
    text,
    Array.fill(90000)('r'.toByte),
    mdNoise(30000))

  test("container round trip through our writer and reader") {
    samples.foreach { s =>
      val info = Xz.decompress(Xz.compress(s, chunkSize = 7000))
      assert(info.data.sameElements(s), s"len=${s.length}")
      assert(info.checkType === 0x04)
      assert(info.checksVerified)
      if (s.nonEmpty) assert(info.nChunks === (s.length + 6999) / 7000)
    }
  }

  test("crc64 matches the ECMA-182 check vector") {
    // public vector: crc64-ecma of "123456789"
    assert(Xz.crc64("123456789".getBytes("UTF-8"), 0, 9) === 0x995dc9bbdf1939faL)
  }

  test("our files decode through xz-java") {
    samples.foreach { s =>
      val in = new XZInputStream(new java.io.ByteArrayInputStream(Xz.compress(s)))
      val got = in.readAllBytes()
      in.close()
      assert(got.sameElements(s), s"len=${s.length}")
    }
  }

  test("xz-java files decode through our reader, presets 0-9") {
    Seq(0, 1, 3, 6, 9).foreach { preset =>
      samples.foreach { s =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new XZOutputStream(bos, new LZMA2Options(preset))
        out.write(s); out.close()
        val info = Xz.decompress(bos.toByteArray)
        assert(info.data.sameElements(s), s"preset=$preset len=${s.length}")
      }
    }
  }

  test("all three check types verify through our reader") {
    Seq(org.tukaani.xz.XZ.CHECK_NONE -> 0x00,
      org.tukaani.xz.XZ.CHECK_CRC32 -> 0x01,
      org.tukaani.xz.XZ.CHECK_CRC64 -> 0x04,
      org.tukaani.xz.XZ.CHECK_SHA256 -> 0x0a).foreach { case (check, code) =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new XZOutputStream(bos, new LZMA2Options(3), check)
      out.write(text); out.close()
      val info = Xz.decompress(bos.toByteArray)
      assert(info.data.sameElements(text), s"check=$code")
      assert(info.checkType === code)
    }
  }

  test("a 2 MB mixed corpus survives xz-java preset 6 through our LZMA core") {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (out.size < (2 << 20)) {
      out.write(text, i % 5000, 2000)
      out.write(mdNoise(64 + i % 128))
      i += 1
    }
    val s = out.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    val xzOut = new XZOutputStream(bos, new LZMA2Options(6))
    xzOut.write(s); xzOut.close()
    assert(Xz.decompress(bos.toByteArray).data.sameElements(s))
  }

  test("malformed files throw: magic, header CRC, check, index, footer, truncation") {
    val good = Xz.compress(text)
    def mutated(i: Int): Array[Byte] = {
      val c = good.clone(); c(i) = (c(i) ^ 0x21).toByte; c
    }
    assertThrows[IllegalArgumentException](Xz.decompress(mutated(0))) // magic
    assertThrows[IllegalArgumentException](Xz.decompress(mutated(8))) // stream flags CRC
    intercept[Exception](Xz.decompress(mutated(30))) // inside chunk data → CRC64
    intercept[Exception](Xz.decompress(good.dropRight(3)))
    intercept[Exception](Xz.decompress(mutated(good.length - 1))) // footer magic
  }
}
