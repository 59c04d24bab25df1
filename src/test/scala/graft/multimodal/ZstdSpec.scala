package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Zstandard codec — round trips through our encoder/decoder,
  * bidirectional cross-checks against zstd-jni across compression
  * levels (exercising Huffman literals, FSE-compressed and repeat
  * tables, treeless blocks, 4-stream literals, repeat offsets),
  * xxHash64 against net.jpountz, frames features, malformed set.
  */
class ZstdSpec extends AnyFunSuite {

  private def mdNoise(n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.io.ByteArrayOutputStream()
    var block = "zstd-noise".getBytes("UTF-8")
    while (out.size < n) { block = md.digest(block); out.write(block) }
    out.toByteArray.take(n)
  }

  private val text =
    ("the zstandard format combines lz77 matching with finite state entropy " +
      "and huffman coding to reach high ratios at high speed. ") * 400

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "a".getBytes("UTF-8"),
    "short sample".getBytes("UTF-8"),
    text.getBytes("UTF-8"),
    Array.fill(100000)('q'.toByte),
    mdNoise(40000),
    (text.take(3000) + new String(mdNoise(2000).map(b => ('a' + (b & 15)).toChar)) + text.take(3000))
      .getBytes("UTF-8"))

  test("round trip through our encoder and decoder") {
    samples.foreach { s =>
      val info = Zstd.decompress(Zstd.compress(s))
      assert(info.data.sameElements(s), s"len=${s.length}")
      assert(info.checksumVerified)
    }
    // multi-block path
    val big = text.getBytes("UTF-8")
    val info = Zstd.decompress(Zstd.compress(big, blockSize = 4096))
    assert(info.data.sameElements(big))
    assert(info.nBlocks === (big.length + 4095) / 4096)
  }

  test("xxhash64 matches net.jpountz on assorted inputs and seeds") {
    val xx = net.jpountz.xxhash.XXHashFactory.safeInstance().hash64()
    samples.foreach { s =>
      Seq(0L, 1L, 0x9e3779b185ebca87L).foreach { seed =>
        assert(Zstd.xxhash64(s, 0, s.length, seed) === xx.hash(s, 0, s.length, seed),
          s"len=${s.length} seed=$seed")
      }
    }
  }

  test("our frames decompress through zstd-jni") {
    samples.foreach { s =>
      val frame = Zstd.compress(s, blockSize = 8192)
      val got = com.github.luben.zstd.Zstd.decompress(frame, s.length)
      assert(got.sameElements(s), s"len=${s.length}")
    }
  }

  test("zstd-jni frames decompress through our decoder, levels 1/3/9/19") {
    Seq(1, 3, 9, 19).foreach { level =>
      samples.foreach { s =>
        val frame = com.github.luben.zstd.Zstd.compress(s, level)
        val info = Zstd.decompress(frame)
        assert(info.data.sameElements(s), s"level=$level len=${s.length}")
      }
    }
  }

  test("zstd-jni frames with checksum verify through our decoder") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3)
    ctx.setChecksum(true)
    val s = text.getBytes("UTF-8")
    val frame = ctx.compress(s)
    val info = Zstd.decompress(frame)
    assert(info.data.sameElements(s))
    assert(info.checksumVerified)
  }

  test("concatenated frames and skippable frames decode in sequence") {
    val a = "first frame ".getBytes("UTF-8")
    val b = "second frame".getBytes("UTF-8")
    val skippable = {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      u32(0x184d2a53); u32(5); out.write("junk!".getBytes("UTF-8"))
      out.toByteArray
    }
    val all = Zstd.compress(a) ++ skippable ++ Zstd.compress(b)
    val info = Zstd.decompress(all)
    assert(new String(info.data, "UTF-8") === "first frame second frame")
    assert(info.nFrames === 3L)
  }

  test("2 MB mixed corpus survives both directions at levels 1 and 19") {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (out.size < (2 << 20)) {
      out.write(text.substring(i % 1000, i % 1000 + 500).getBytes("UTF-8"))
      out.write(mdNoise(64 + i % 192))
      out.write(Array.fill(i % 300)('x'.toByte))
      i += 1
    }
    val s = out.toByteArray
    Seq(1, 19).foreach { level =>
      val theirFrame = com.github.luben.zstd.Zstd.compress(s, level)
      assert(Zstd.decompress(theirFrame).data.sameElements(s), s"level=$level")
    }
    val ourFrame = Zstd.compress(s)
    assert(com.github.luben.zstd.Zstd.decompress(ourFrame, s.length).sameElements(s))
    assert(Zstd.decompress(ourFrame).data.sameElements(s))
  }

  test("our compressed blocks beat raw on repetitive input") {
    val s = ("repeat the corpus line " * 400).getBytes("UTF-8")
    assert(Zstd.compress(s).length < s.length / 4)
  }

  test("malformed frames throw: magic, checksum, content size, truncation, reserved bits") {
    val s = ("integrity " * 200).getBytes("UTF-8")
    val good = Zstd.compress(s)
    def mutated(i: Int): Array[Byte] = {
      val c = good.clone(); c(i) = (c(i) ^ 0x11).toByte; c
    }
    assertThrows[IllegalArgumentException](Zstd.decompress(mutated(0))) // magic
    assertThrows[IllegalArgumentException](
      Zstd.decompress(mutated(good.length - 2))) // content checksum
    assertThrows[IllegalArgumentException](Zstd.decompress(good.dropRight(7)))
    intercept[Exception](Zstd.decompress(mutated(10))) // inside a block
    // reserved frame-header bit
    val reserved = good.clone()
    reserved(4) = (reserved(4) | 0x08).toByte
    assertThrows[IllegalArgumentException](Zstd.decompress(reserved))
  }
}
