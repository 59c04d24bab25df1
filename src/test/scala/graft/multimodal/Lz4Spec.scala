package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 block + frame codec — round trips, xxHash32 against the
  * published vectors and net.jpountz's implementation, bidirectional
  * cross-checks against lz4-java (block and frame), malformed set.
  */
class Lz4Spec extends AnyFunSuite {

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "tiny".getBytes("UTF-8"),
    ("the quick brown fox jumps over the lazy dog. " * 80).getBytes("UTF-8"),
    Array.fill(70000)('y'.toByte), // forces multi-block at 64 KB
    Array.tabulate(9000)(i => (i * 37 % 241).toByte))

  test("block round trip through our encoder and decoder") {
    samples.filter(_.nonEmpty).foreach { s =>
      val packed = Lz4.compressBlock(s)
      assert(Lz4.decompressBlock(packed, 0, packed.length, s.length).sameElements(s))
    }
  }

  test("xxhash32 matches net.jpountz on assorted inputs and seeds") {
    val xx = net.jpountz.xxhash.XXHashFactory.safeInstance().hash32()
    samples.foreach { s =>
      Seq(0, 1, 0x9747b28c).foreach { seed =>
        assert(Lz4.xxhash32(s, 0, s.length, seed) === xx.hash(s, 0, s.length, seed),
          s"len=${s.length} seed=$seed")
      }
    }
  }

  test("our blocks decompress through lz4-java") {
    val dec = net.jpountz.lz4.LZ4Factory.safeInstance().safeDecompressor()
    samples.filter(_.nonEmpty).foreach { s =>
      val packed = Lz4.compressBlock(s)
      val out = new Array[Byte](s.length)
      dec.decompress(packed, 0, packed.length, out, 0)
      assert(out.sameElements(s))
    }
  }

  test("lz4-java blocks decompress through our decoder") {
    val enc = net.jpountz.lz4.LZ4Factory.safeInstance().fastCompressor()
    samples.filter(_.nonEmpty).foreach { s =>
      val packed = enc.compress(s)
      assert(Lz4.decompressBlock(packed, 0, packed.length, s.length).sameElements(s))
    }
  }

  test("frame round trip: multi-block, stored blocks, all checksum knobs") {
    val text = ("frame me " * 2000).getBytes("UTF-8") // compressible, > 2 blocks at 8 KB
    val noise = { // md5 chain: aperiodic, incompressible → stored blocks
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new java.io.ByteArrayOutputStream()
      var block = "seed".getBytes("UTF-8")
      while (out.size < 5000) { block = md.digest(block); out.write(block) }
      out.toByteArray.take(5000)
    }
    for {
      blockChecksum <- Seq(true, false)
      contentSize <- Seq(true, false)
      s <- Seq(text, noise)
    } {
      val frame = Lz4.compressFrame(s, blockSize = 8192,
        blockChecksum = blockChecksum, contentChecksum = true, contentSize = contentSize)
      val info = Lz4.decompressFrame(frame)
      assert(info.data.sameElements(s))
      assert(info.nBlocks === (s.length + 8191) / 8192)
      assert(info.blockChecksums === blockChecksum)
      assert(info.contentChecksum)
    }
    // the incompressible payload genuinely exercises the stored path
    assert(Lz4.decompressFrame(Lz4.compressFrame(noise, blockSize = 4096)).nStored > 0)
  }

  test("our frames decompress through lz4-java's frame reader") {
    val s = ("cross check frame " * 500).getBytes("UTF-8")
    val frame = Lz4.compressFrame(s, blockSize = 4096, blockChecksum = true)
    val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(frame))
    val got = in.readAllBytes()
    in.close()
    assert(got.sameElements(s))
  }

  test("lz4-java frames decompress through our frame reader") {
    val s = ("the other direction " * 700).getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(s); out.close()
    val info = Lz4.decompressFrame(bos.toByteArray)
    assert(info.data.sameElements(s))
  }

  test("malformed frames throw: magic, HC, block checksum, content checksum, truncation") {
    val s = ("guard me " * 300).getBytes("UTF-8")
    val good = Lz4.compressFrame(s, blockSize = 1024, blockChecksum = true)
    def mutated(i: Int): Array[Byte] = {
      val c = good.clone(); c(i) = (c(i) ^ 0x20).toByte; c
    }
    assertThrows[IllegalStateException](Lz4.decompressFrame(mutated(0))) // magic
    assertThrows[IllegalStateException](Lz4.decompressFrame(mutated(6))) // HC byte
    assertThrows[IllegalStateException](Lz4.decompressFrame(mutated(12))) // inside block 1
    assertThrows[IllegalStateException](Lz4.decompressFrame(good.dropRight(5)))
    assertThrows[IllegalStateException](
      Lz4.decompressFrame(mutated(good.length - 2))) // content checksum
  }
}
