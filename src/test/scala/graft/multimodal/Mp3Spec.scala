package graft.multimodal

import graft.SparkSpec

/** Mp3 — frame-length arithmetic against the published tables, ID3v2
  * syncsafe skip, truncated-tail and garbage handling, VBR walking,
  * and CRC-flag tolerance.
  */
class Mp3Spec extends SparkSpec {

  private def cat(parts: Array[Byte]*): Array[Byte] = parts.reduce(_ ++ _)

  test("frame length arithmetic matches the spec formula") {
    // 128 kbps @ 44100: 144*128000/44100 = 417 (+1 padded)
    assert(Mp3.frameLen(128, 44100, padded = false) === 417)
    assert(Mp3.frameLen(128, 44100, padded = true) === 418)
    // 320 kbps @ 32000: 144*320000/32000 = 1440
    assert(Mp3.frameLen(320, 32000, padded = false) === 1440)
    // 32 kbps @ 48000: 144*32000/48000 = 96
    assert(Mp3.frameLen(32, 48000, padded = false) === 96)
  }

  test("clean stream: frames counted, duration sample-exact") {
    // 10 frames of 128 kbps @ 44100 (bIdx 9, rIdx 0)
    val m = Mp3.parse(cat((0 until 10).map(i => Mp3.frame(9, 0, i % 2 == 0)): _*))
    assert(m.valid && m.nFrames === 10L)
    assert(m.bitrateKbps === 128 && m.sampleRate === 44100)
    assert(m.durationMs === 10L * 1152L * 1000L / 44100L) // 261 ms
    assert(m.id3Bytes === 0L)
  }

  test("ID3v2 tag skipped by syncsafe size, including sizes >= 128") {
    val m = Mp3.parse(cat(Mp3.id3(200), Mp3.frame(5, 1, padded = false)))
    assert(m.valid && m.nFrames === 1L && m.id3Bytes === 210L)
    assert(m.sampleRate === 48000)
  }

  test("truncated tail frame ends the walk; counted frames stay valid") {
    val full = Mp3.frame(9, 0, padded = false)
    val m = Mp3.parse(cat(full, full.take(100)))
    assert(m.valid && m.nFrames === 1L)
  }

  test("VBR: mixed bitrates walk by per-frame length, first frame reported") {
    val m = Mp3.parse(cat(Mp3.frame(14, 0, padded = false), // 320 kbps
      Mp3.frame(1, 0, padded = false), // 32 kbps
      Mp3.frame(9, 0, padded = true)))
    assert(m.valid && m.nFrames === 3L && m.bitrateKbps === 320)
  }

  test("CRC-protected frames (protection bit 0) still sync") {
    val f = Mp3.frame(9, 0, padded = false)
    f(1) = 0xfa.toByte // protection bit 0
    assert(Mp3.parse(f).valid)
  }

  test("garbage, empty, reserved indices, and oversized ID3 are invalid") {
    assert(!Mp3.parse(null).valid)
    assert(!Mp3.parse(Array[Byte](1, 2, 3)).valid)
    assert(!Mp3.parse(Array.fill[Byte](64)(0x55)).valid)
    // reserved bitrate index 15
    val bad = Mp3.frame(9, 0, padded = false)
    bad(2) = (15 << 4).toByte
    assert(!Mp3.parse(bad).valid)
    // ID3 size pointing past the payload
    assert(!Mp3.parse(Mp3.id3(1000).take(50)).valid)
  }
}
