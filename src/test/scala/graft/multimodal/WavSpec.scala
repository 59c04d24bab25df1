package graft.multimodal

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}

/** Wav codec — encode/decode round trip, chunk walking, and the
  * malformed-payload contract (valid=false, never an exception).
  */
class WavSpec extends SparkSpec {

  test("encode/decode round trip with exact integer statistics") {
    val samples = Array[Short](0, 100, -200, 300, -1024, 1023)
    val info = Wav.decode(Wav.encode(16000, samples))
    assert(info.valid)
    assert(info.sampleRate === 16000)
    assert(info.channels === 1)
    assert(info.bitsPerSample === 16)
    assert(info.nSamples === 6L)
    assert(info.durationMs === 6L * 1000 / 16000)
    assert(info.sumSq === samples.map(s => s.toLong * s).sum)
    assert(info.peakAbs === 1024L)
  }

  test("decoder walks extra chunks before fmt/data") {
    // RIFF with a junk LIST chunk (odd size → word-aligned padding)
    // ahead of fmt, as real-world encoders emit
    val samples = Array[Short](5, -5)
    val std = Wav.encode(8000, samples)
    val listBody = Array[Byte](1, 2, 3) // size 3, padded to 4
    val out = ByteBuffer.allocate(std.length + 8 + 4).order(ByteOrder.LITTLE_ENDIAN)
    out.put(std, 0, 12) // RIFF....WAVE
      .put("LIST".getBytes("US-ASCII")).putInt(3).put(listBody).put(0.toByte)
      .put(std, 12, std.length - 12)
    val info = Wav.decode(out.array())
    assert(info.valid)
    assert(info.nSamples === 2L)
    assert(info.sumSq === 50L)
  }

  test("malformed payloads yield valid=false, never exceptions") {
    val good = Wav.encode(8000, Array[Short](1, 2, 3))
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      "not audio at all, just some text".getBytes("UTF-8"),
      good.take(20), // truncated mid-header
      { val b = good.clone(); b(8) = 'X'.toByte; b }, // WAVE magic broken
      { val b = good.clone(); b(20) = 3.toByte; b } // IEEE-float format, not PCM
    )
    cases.foreach { bytes =>
      val info = Wav.decode(bytes)
      assert(!info.valid, s"expected invalid for ${Option(bytes).map(_.take(8).mkString(",")).getOrElse("null")}")
      assert(info.nSamples === 0L && info.sumSq === 0L)
    }
  }

  test("declared chunk size beyond the buffer is rejected, not read") {
    val good = Wav.encode(8000, Array[Short](1, 2))
    val b = good.clone()
    // blow up the data chunk's declared size (offset 40 in the
    // standard 44-byte header layout)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putInt(40, Int.MaxValue)
    assert(!Wav.decode(b).valid)
  }

  test("g711 expansions hit the published reference points") {
    // μ-law: 0xFF is +0, 0x7F is -0, 0x00 is the negative rail -32124
    assert(G711.ulaw2linear(0xFF.toByte) == 0)
    assert(G711.ulaw2linear(0x7F.toByte) == 0)
    assert(G711.ulaw2linear(0x00.toByte) == -32124)
    assert(G711.ulaw2linear(0x80.toByte) == 32124)
    // A-law: no zero code — 0x55 decodes to -8, 0xD5 to +8; rails ±32256
    assert(G711.alaw2linear(0x55.toByte) == -8)
    assert(G711.alaw2linear(0xD5.toByte) == 8)
    assert(G711.alaw2linear(0x2A.toByte) == -32256)
    assert(G711.alaw2linear(0xAA.toByte) == 32256)
    // both decoders are odd functions across the sign bit
    for (v <- 0 until 128) {
      assert(G711.ulaw2linear(v.toByte) == -G711.ulaw2linear((v | 0x80).toByte))
      assert(G711.alaw2linear(v.toByte) == -G711.alaw2linear((v | 0x80).toByte))
    }
  }

  test("g711 wav containers decode stats over the expanded samples") {
    val data = Array.tabulate(256)(i => i.toByte) // every code point once
    for ((fmt, dec) <- Seq(7 -> G711.ulaw2linear _, 6 -> G711.alaw2linear _)) {
      val info = Wav.decode(Wav.encodeG711(8000, data, fmt))
      assert(info.valid && info.bitsPerSample == 8 && info.nSamples == 256)
      assert(info.durationMs == 256 * 1000L / 8000)
      val lin = data.map(dec)
      assert(info.sumSq == lin.map(v => v.toLong * v).sum)
      assert(info.peakAbs == lin.map(v => math.abs(v).toLong).max)
    }
    intercept[IllegalArgumentException](Wav.encodeG711(8000, Array[Byte](1), 1))
  }

  test("adpcm predictor step hits the reference points") {
    // nib 0 at index 0: step 7, diff 7>>3 = 0 — predictor unchanged, index clamps at 0
    assert(Adpcm.step(100, 0, 0) == ((100, 0)))
    // max magnitude at index 88: diff = 4095+8191+16383+32767 = 61436 → clamps both rails
    assert(Adpcm.step(0, 88, 7)._1 == 32767)
    assert(Adpcm.step(0, 88, 15)._1 == -32768)
    // index adjustments: low nibbles walk down, high mantissas jump up, clamped to [0, 88]
    assert(Adpcm.step(0, 5, 0)._2 == 4)
    assert(Adpcm.step(0, 5, 7)._2 == 13)
    assert(Adpcm.step(0, 88, 4)._2 == 88)
    // sign bit mirrors the delta exactly when no clamp engages
    for (nib <- 0 until 8; idx <- Seq(0, 10, 40)) {
      val up = Adpcm.step(0, idx, nib)
      val dn = Adpcm.step(0, idx, nib | 8)
      assert(up._1 == -dn._1 && up._2 == dn._2)
    }
  }

  test("adpcm wav containers replay the recurrence across blocks") {
    // two full blocks + a short final block; decode must equal a
    // manual replay through Adpcm.step with per-block header resets
    val blocks = Seq(
      (1000, 20, Array.tabulate(8)(i => (i * 37 % 256).toByte)),
      (-2000, 60, Array.tabulate(8)(i => (255 - i * 11 % 256).toByte)),
      (123, 0, Array.tabulate(3)(i => (i * 91 % 256).toByte)))
    val info = Wav.decode(Wav.encodeAdpcm(8000, blocks, 12))
    assert(info.valid && info.bitsPerSample == 4)
    var sumSq = 0L; var peak = 0L; var n = 0L
    blocks.foreach { case (p0, i0, data) =>
      var pred = p0; var idx = i0
      def fold(v: Int): Unit = { sumSq += v.toLong * v; peak = math.max(peak, math.abs(v).toLong); n += 1 }
      fold(pred)
      data.foreach { b =>
        val (p1, i1) = Adpcm.step(pred, idx, b & 0xf); fold(p1)
        val (p2, i2) = Adpcm.step(p1, i1, (b & 0xff) >> 4); fold(p2)
        pred = p2; idx = i2
      }
    }
    assert(info.nSamples == n && info.sumSq == sumSq && info.peakAbs == peak)
    // a corrupt step index is rejected, not decoded
    assert(!Wav.decode(Wav.encodeAdpcm(8000, Seq((0, 89, Array[Byte](1, 2))), 6)).valid)
  }
}
