package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Tar codec — ustar round trip, header checksum verification, gzip
  * route, and the malformed contract.
  */
class TarSpec extends AnyFunSuite {
  import Tar.TarEntrySpec

  private def md5(parts: Seq[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  private val entries = Seq(
    TarEntrySpec("data/", Array.emptyByteArray, dir = true),
    TarEntrySpec("data/a.txt", "alpha content".getBytes("UTF-8")),
    TarEntrySpec("data/b.bin", Array.tabulate(1300)(i => (i * 7).toByte)), // > 2 blocks
    TarEntrySpec("empty.txt", Array.emptyByteArray))

  test("round trip: entries, files, dirs, sizes, hashes") {
    val info = Tar.decode(Tar.encode(entries))
    assert(info.valid)
    assert(info.nEntries === 4L)
    assert(info.nFiles === 3L)
    assert(info.nDirs === 1L)
    assert(info.totalBytes === (13 + 1300 + 0).toLong)
    assert(info.namesMd5 === md5(entries.map(_.name.getBytes("UTF-8"))))
    assert(info.contentMd5 === md5(entries.filter(!_.dir).map(_.content)))
  }

  test("gzipped tarballs decode identically") {
    val plain = Tar.encode(entries)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    assert(Tar.decode(bos.toByteArray) === Tar.decode(plain))
  }

  test("JDK-independent evidence: the header checksum catches a flipped name byte") {
    val bytes = Tar.encode(entries)
    // flip a byte inside the second header's name field (first is dir at 0)
    bytes(512 + 3) = (bytes(512 + 3) ^ 0x01).toByte
    assert(!Tar.decode(bytes).valid)
  }

  test("malformed payloads yield valid=false, never exceptions") {
    assert(!Tar.decode(null).valid)
    assert(!Tar.decode(Array.emptyByteArray).valid)
    assert(!Tar.decode(new Array[Byte](2048)).valid, "all-zero archive has no entries")
    assert(!Tar.decode(Array.fill(2048)(0x41.toByte)).valid, "no ustar magic")
    val good = Tar.encode(entries)
    for (cut <- Seq(100, 513, good.length / 2, good.length - 700))
      assert(!Tar.decode(java.util.Arrays.copyOf(good, cut)).valid, s"cut $cut")
  }
}
