package graft.multimodal

import graft.SparkSpec

/** Flac codec — lossless round-trip exactness across every subframe
  * family, multi-frame streams, CRC/MD5 corruption evidence, metadata
  * skipping, and hand-crafted frames for the decoder-only paths
  * (wasted bits, escaped partitions) the encoder never emits.
  */
class FlacSpec extends SparkSpec {

  private def stats(samples: Array[Int]): (Long, Long) =
    (samples.map(s => s.toLong * s).sum, samples.map(s => math.abs(s.toLong)).max)

  private def roundTrip(samples: Array[Int], rate: Int = 8000, blockSize: Int = 256): Flac.FlacInfo = {
    val bytes = Flac.encode(rate, samples, blockSize)
    val info = Flac.decode(bytes)
    assert(info.valid, "decode failed")
    assert(info.md5Ok, "MD5 mismatch — decode is not lossless")
    assert(info.nSamples === samples.length.toLong)
    val (sq, pk) = stats(samples)
    assert(info.sumSq === sq)
    assert(info.peakAbs === pk)
    assert(info.sampleRate === rate)
    assert(info.channels === 1)
    assert(info.bitsPerSample === 16)
    info
  }

  test("constant block round trip (CONSTANT subframe engages)") {
    val s = Array.fill(300)(-1234)
    roundTrip(s)
    val hist = Flac.subframeHistogram(Flac.encode(8000, s, 256))
    assert(hist.getOrElse("constant", 0) > 0)
  }

  test("linear ramp round trip (FIXED predictor engages)") {
    val s = Array.tabulate(500)(i => -50 + 3 * i)
    roundTrip(s)
    val hist = Flac.subframeHistogram(Flac.encode(8000, s, 256))
    assert(hist.getOrElse("fixed", 0) > 0)
  }

  test("high-frequency sinusoid round trip (LPC engages and wins)") {
    // near-Nyquist tones: fixed differencing AMPLIFIES them (gain
    // (2·sin(ω/2))^k per order), while a 2-pole LPC predictor nails
    // any single frequency — the signal class where LPC must win
    val s = Array.tabulate(1024)(i =>
      (8000 * math.sin(i * 1.9) + 3000 * math.sin(i * 0.9 + 1.0)).toInt)
    roundTrip(s, blockSize = 512)
    val hist = Flac.subframeHistogram(Flac.encode(8000, s, 512))
    assert(hist.getOrElse("lpc", 0) > 0,
      s"expected LPC on a high-frequency tonal signal, got $hist")
  }

  test("incompressible noise round trip (VERBATIM or high-param rice, still exact)") {
    val rnd = new scala.util.Random(42)
    val s = Array.fill(400)(rnd.nextInt(65536) - 32768)
    roundTrip(s)
  }

  test("full-scale extremes round trip") {
    val s = Array.tabulate(64)(i => if (i % 2 == 0) Short.MinValue.toInt else Short.MaxValue.toInt)
    roundTrip(s, blockSize = 16)
  }

  test("multi-frame stream with short final block") {
    val s = Array.tabulate(1000)(i => (i * 17) % 2048 - 1024) // 256+256+256+232
    val info = roundTrip(s, rate = 44100, blockSize = 256)
    assert(info.durationMs === 1000L * 1000 / 44100)
  }

  test("single sample and tiny blocks") {
    roundTrip(Array(7), blockSize = 16)
    roundTrip(Array(-32768, 32767, 0), blockSize = 16)
  }

  test("bit flip in a frame body is caught (CRC-16 or MD5)") {
    val s = Array.tabulate(300)(i => (i * 31) % 1000 - 500)
    val bytes = Flac.encode(8000, s, 256)
    // flip one bit somewhere in the first frame's residual region
    val pos = 60
    bytes(pos) = (bytes(pos) ^ 0x10).toByte
    val info = Flac.decode(bytes)
    assert(!info.valid || !info.md5Ok, "corruption sailed through undetected")
  }

  test("bit flip in a frame header is caught by CRC-8") {
    val s = Array.tabulate(100)(i => i - 50)
    val bytes = Flac.encode(8000, s, 256)
    // frame starts at 42 (magic 4 + header 4 + streaminfo 34); flip in header byte 3
    bytes(45) = (bytes(45) ^ 0x02).toByte
    assert(!Flac.decode(bytes).valid)
  }

  test("malformed payloads yield valid=false, never exceptions") {
    assert(!Flac.decode(null).valid)
    assert(!Flac.decode(Array.emptyByteArray).valid)
    assert(!Flac.decode("fLaCjunkjunkjunk".getBytes("US-ASCII")).valid)
    assert(!Flac.decode(Array.fill(100)(0x55.toByte)).valid)
    val good = Flac.encode(8000, Array.tabulate(100)(identity), 256)
    for (cut <- Seq(3, 10, 41, 43, good.length - 2))
      assert(!Flac.decode(java.util.Arrays.copyOf(good, cut)).valid, s"truncation at $cut")
  }

  test("unknown metadata blocks are skipped") {
    val s = Array.tabulate(200)(i => i % 97 - 48)
    val std = Flac.encode(8000, s, 256)
    // clear last-metadata flag on STREAMINFO, splice in a PADDING block
    val padLen = 9
    val out = new Array[Byte](std.length + 4 + padLen)
    System.arraycopy(std, 0, out, 0, 42)
    out(4) = (out(4) & 0x7f).toByte // STREAMINFO no longer last
    out(42) = (0x80 | 1).toByte // last block, type PADDING
    out(43) = 0; out(44) = 0; out(45) = padLen.toByte
    System.arraycopy(std, 42, out, 42 + 4 + padLen, std.length - 42)
    val info = Flac.decode(out)
    assert(info.valid && info.md5Ok)
    assert(info.nSamples === 200L)
  }

  /** Hand-craft a stream exercising decoder-only paths. Layout helpers
    * mirror the writer the encoder uses, via package-private access.
    */
  private def handStream(writeFrame: Flac.BitWriter => Unit,
                         samples: Array[Int], rate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new Flac.BitWriter
    si.write(1L, 1); si.write(0L, 7); si.write(34L, 24)
    si.write(16L, 16); si.write(65535L, 16)
    si.write(0L, 24); si.write(0L, 24)
    si.write(rate.toLong, 20); si.write(0L, 3); si.write(15L, 5)
    si.write(samples.length.toLong, 36)
    out.write(si.toBytes)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { v => md5.update((v & 0xff).toByte); md5.update(((v >> 8) & 0xff).toByte) }
    out.write(md5.digest())
    val w = new Flac.BitWriter
    writeFrame(w)
    out.write(w.toBytes)
    out.toByteArray
  }

  private def frameHeader(w: Flac.BitWriter, n: Int): Unit = {
    w.write(0x3ffe, 14); w.write(0L, 2) // sync + reserved + fixed strategy
    w.write(7L, 4); w.write(0L, 4) // 16-bit block size at end; rate from streaminfo
    w.write(0L, 4); w.write(4L, 3); w.write(0L, 1) // mono, 16-bit, reserved
    w.write(0L, 8) // frame number 0
    w.write((n - 1).toLong, 16)
    val hdr = w.toBytes
    w.write(Flac.crc8(hdr, 0, hdr.length).toLong, 8)
  }

  test("wasted-bits subframes reconstruct the shifted samples") {
    val n = 48
    val base = -321 // 15-bit value; true samples are base << 1
    val samples = Array.fill(n)(base << 1)
    val bytes = handStream({ w =>
      frameHeader(w, n)
      w.write(0L, 1); w.write(0L, 6) // CONSTANT
      w.write(1L, 1) // wasted-bits flag
      w.write(1L, 1) // unary 0 → wasted = 1
      w.write((base.toLong & 0x7fff), 15) // 16 − 1 effective bits
      w.alignToByte()
      val f = w.toBytes
      w.write(Flac.crc16(f, 0, f.length).toLong, 16)
    }, samples, 8000)
    val info = Flac.decode(bytes)
    assert(info.valid, "wasted-bits frame rejected")
    assert(info.md5Ok, "wasted-bits reconstruction wrong")
    assert(info.sumSq === samples.map(s => s.toLong * s).sum)
  }

  test("escaped (raw) rice partitions decode exactly") {
    val n = 32
    val vals = Array.tabulate(n)(i => i - 16) // fit in 6 raw bits signed
    val bytes = handStream({ w =>
      frameHeader(w, n)
      w.write(0L, 1); w.write(8L, 6); w.write(0L, 1) // FIXED order 0, no wasted bits
      w.write(0L, 2); w.write(0L, 4) // rice method 0, partition order 0
      w.write(0xfL, 4) // escape
      w.write(6L, 5) // 6 raw bits per residual
      vals.foreach(v => w.write(v.toLong & 0x3f, 6))
      w.alignToByte()
      val f = w.toBytes
      w.write(Flac.crc16(f, 0, f.length).toLong, 16)
    }, vals, 8000)
    val info = Flac.decode(bytes)
    assert(info.valid && info.md5Ok, "escaped partition mis-decoded")
    assert(info.peakAbs === 16L)
  }

  test("reserved subframe types and bad residual methods are rejected") {
    val n = 16
    val vals = Array.fill(n)(0)
    val reserved = handStream({ w =>
      frameHeader(w, n)
      w.write(0L, 1); w.write(2L, 6); w.write(0L, 1) // type 2 = reserved
      w.alignToByte()
      val f = w.toBytes
      w.write(Flac.crc16(f, 0, f.length).toLong, 16)
    }, vals, 8000)
    assert(!Flac.decode(reserved).valid)
  }

  test("compression is real on structured signals") {
    val smooth = Array.tabulate(4096)(i => (6000 * math.sin(i * 0.02)).toInt)
    val bytes = Flac.encode(8000, smooth, 1024)
    assert(bytes.length < smooth.length * 2 / 2, // < half the raw PCM size
      s"LPC coding should beat raw PCM by 2x on a sinusoid, got ${bytes.length} vs ${smooth.length * 2}")
  }

  test("total-samples mismatch against STREAMINFO is rejected") {
    val s = Array.tabulate(100)(i => i)
    val bytes = Flac.encode(8000, s, 256)
    // STREAMINFO total samples field: bytes 4+4+13 .. — low 36 bits end at
    // offset 21+4+4−? Simpler: truncate the last frame entirely is covered
    // above; here corrupt the count field (last byte of the 36-bit field,
    // byte 25 of STREAMINFO = offset 8 + 25 = 33) and expect a count
    // mismatch or MD5/CRC failure.
    bytes(33) = (bytes(33) ^ 0x01).toByte
    val info = Flac.decode(bytes)
    assert(!info.valid || !info.md5Ok)
  }
}
