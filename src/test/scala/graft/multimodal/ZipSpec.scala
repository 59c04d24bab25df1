package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Zip codec — central-directory walk, CRC verification, and
  * bidirectional cross-checks against the JDK's own zip streams.
  */
class ZipSpec extends AnyFunSuite {
  import Zip.ZipEntrySpec

  private def md5(parts: Seq[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  private val entries = Seq(
    ZipEntrySpec("a.txt", "stored content alpha".getBytes("UTF-8"), deflate = false),
    ZipEntrySpec("dir/b.txt", ("squeeze me " * 40).getBytes("UTF-8"), deflate = true),
    ZipEntrySpec("empty.txt", Array.emptyByteArray, deflate = true))

  test("round trip: counts, sizes, name and content hashes") {
    val info = Zip.decode(Zip.encode(entries))
    assert(info.valid)
    assert(info.nEntries === 3L)
    assert(info.nDeflated === 2L)
    assert(info.totalBytes === entries.map(_.content.length.toLong).sum)
    assert(info.namesMd5 === md5(entries.map(_.name.getBytes("UTF-8"))))
    assert(info.contentMd5 === md5(entries.map(_.content)))
  }

  test("our archives open in the JDK's ZipInputStream with identical contents") {
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(Zip.encode(entries)))
    var got = List.empty[(String, Array[Byte])]
    var e = zin.getNextEntry
    while (e != null) {
      got = got :+ (e.getName -> zin.readAllBytes())
      e = zin.getNextEntry
    }
    assert(got.map(_._1) === entries.map(_.name).toList)
    got.zip(entries).foreach { case ((_, b), spec) => assert(b.sameElements(spec.content)) }
  }

  test("JDK-written archives decode through our central-directory walk") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    entries.foreach { sp =>
      val ze = new ZipEntry(sp.name)
      if (!sp.deflate) {
        ze.setMethod(ZipEntry.STORED)
        ze.setSize(sp.content.length)
        val c = new java.util.zip.CRC32(); c.update(sp.content); ze.setCrc(c.getValue)
      }
      zout.putNextEntry(ze)
      zout.write(sp.content)
      zout.closeEntry()
    }
    zout.close()
    val info = Zip.decode(bos.toByteArray)
    assert(info.valid, "JDK archive rejected")
    assert(info.nEntries === 3L)
    assert(info.totalBytes === entries.map(_.content.length.toLong).sum)
    assert(info.contentMd5 === md5(entries.map(_.content)))
  }

  test("a trailing archive comment does not hide the EOCD") {
    val withComment = Zip.encode(entries) ++ "trailing zip comment".getBytes("UTF-8")
    // note: comment length field says 0 but the EOCD backward scan
    // still finds the record — the tolerant-reader behavior
    assert(Zip.decode(withComment).valid)
  }

  test("corruption is caught: flipped content bit fails CRC") {
    val bytes = Zip.encode(entries)
    // flip a bit inside the first stored entry's payload
    bytes(30 + "a.txt".length + 3) = (bytes(30 + "a.txt".length + 3) ^ 0x40).toByte
    assert(!Zip.decode(bytes).valid)
  }

  test("malformed payloads yield valid=false, never exceptions") {
    assert(!Zip.decode(null).valid)
    assert(!Zip.decode(Array.emptyByteArray).valid)
    assert(!Zip.decode("PKjunk".getBytes).valid)
    val good = Zip.encode(entries)
    for (cut <- Seq(4, 30, good.length / 2, good.length - 3))
      assert(!Zip.decode(java.util.Arrays.copyOf(good, cut)).valid, s"cut $cut")
  }
}
