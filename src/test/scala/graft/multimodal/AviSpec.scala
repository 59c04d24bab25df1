package graft.multimodal

import graft.SparkSpec

/** Avi — RIFF/AVI MJPEG container round-trip, frame sampling
  * arithmetic, word-alignment padding, malformed-payload hygiene,
  * and the Dataset-level videoFrameStats plumbing.
  */
class AviSpec extends SparkSpec {

  private def flatFrame(bw: Int, bh: Int, seed: Int): Array[Byte] =
    Jpeg.encodeFlatBlocks(bw, bh, (bx, by) =>
      (((7 * bx + 3 * by + seed) % 256 + 256) % 256,
        128 + ((5 * bx + by + seed) % 40),
        128 - ((bx + 2 * by + seed) % 40)))

  test("round-trip: decoded stats equal the per-frame JPEG decode fold") {
    val frames = (0 until 4).map(f => flatFrame(2, 1, 10 * f))
    val avi = Avi.encodeMjpeg(16, 8, 40000, frames)
    val v = Avi.decode(avi)
    assert(v.valid)
    assert(v.width === 16 && v.height === 8)
    assert(v.nFrames === 4 && v.nSampled === 4)
    assert(v.durationMs === 4L * 40000L / 1000L)
    val per = frames.map(Jpeg.decode)
    assert(per.forall(_.valid))
    assert(v.sumR === per.map(_.sumR).sum)
    assert(v.sumG === per.map(_.sumG).sum)
    assert(v.sumB === per.map(_.sumB).sum)
    assert(v.peak === per.map(_.peak).max)
  }

  test("step sampling decodes frames 0, step, 2*step only") {
    val frames = (0 until 5).map(f => flatFrame(1, 1, f))
    val avi = Avi.encodeMjpeg(8, 8, 33333, frames)
    val v = Avi.decode(avi, step = 2)
    assert(v.valid && v.nFrames === 5 && v.nSampled === 3)
    val sampled = Seq(0, 2, 4).map(f => Jpeg.decode(frames(f)))
    assert(v.sumR === sampled.map(_.sumR).sum)
    assert(v.sumG === sampled.map(_.sumG).sum)
    assert(v.sumB === sampled.map(_.sumB).sum)
    // step larger than the clip still decodes frame 0
    val v2 = Avi.decode(avi, step = 100)
    assert(v2.valid && v2.nSampled === 1)
    assert(v2.sumR === Jpeg.decode(frames(0)).sumR)
  }

  test("odd-length frame chunks are word-padded and still parse") {
    // entropy-segment length varies with the DC categories, so some
    // seed yields an odd-length JPEG; the chunk after it must still
    // align (the RIFF word-padding rule)
    val odd = (0 until 64).map(s => flatFrame(1, 1, s))
      .find(_.length % 2 == 1)
    assert(odd.isDefined, "no odd-length frame found in 64 seeds")
    val frames = Seq(odd.get, flatFrame(1, 1, 0), odd.get)
    val avi = Avi.encodeMjpeg(8, 8, 50000, frames)
    val v = Avi.decode(avi)
    assert(v.valid && v.nFrames === 3)
    val per = frames.map(Jpeg.decode)
    assert(v.sumR === per.map(_.sumR).sum)
  }

  test("duration uses integer microsecond arithmetic") {
    val avi = Avi.encodeMjpeg(8, 8, 33333, Seq(flatFrame(1, 1, 1)))
    assert(Avi.decode(avi).durationMs === 33L) // 33333/1000 floored
  }

  test("malformed payloads are invalid rows, never exceptions") {
    assert(!Avi.decode(null).valid)
    assert(!Avi.decode(Array.emptyByteArray).valid)
    assert(!Avi.decode(Array.fill[Byte](64)(0x41)).valid)
    // a WAV is RIFF but not AVI
    val wav = Wav.encode(8000, Array.fill[Short](16)(100))
    assert(!Avi.decode(wav).valid)
    // truncation mid-movi: decode fails closed (frame spans cut)
    val good = Avi.encodeMjpeg(8, 8, 40000, (0 until 3).map(f => flatFrame(1, 1, f)))
    val cut = java.util.Arrays.copyOf(good, good.length / 2)
    val vc = Avi.decode(cut)
    // either invalid or a consistent prefix — never a throw
    if (vc.valid) assert(vc.nFrames >= 1 && vc.nFrames <= 3)
  }

  test("non-MJPG vids handler is rejected") {
    val good = Avi.encodeMjpeg(8, 8, 40000, Seq(flatFrame(1, 1, 0)))
    // patch the strh fccHandler "MJPG" -> "H264"
    val s = new String(good, "ISO-8859-1")
    val at = s.indexOf("vids")
    assert(at > 0)
    val bad = good.clone()
    System.arraycopy("H264".getBytes("US-ASCII"), 0, bad, at + 4, 4)
    assert(!Avi.decode(bad).valid)
  }

  test("frame/header dimension mismatch fails closed") {
    val frames = Seq(flatFrame(1, 1, 0), flatFrame(2, 1, 0))
    val avi = Avi.encodeMjpeg(8, 8, 40000, frames)
    assert(!Avi.decode(avi).valid)
  }

  test("a corrupt sampled frame invalidates the clip") {
    val frames = (0 until 2).map(f => flatFrame(1, 1, f))
    val avi = Avi.encodeMjpeg(8, 8, 40000, frames)
    // find the second SOI and wreck its entropy segment tail
    var soi2 = -1
    var hits = 0
    var i = 0
    while (i < avi.length - 1 && soi2 < 0) {
      if ((avi(i) & 0xff) == 0xff && (avi(i + 1) & 0xff) == 0xd8) {
        hits += 1
        if (hits == 2) soi2 = i
      }
      i += 1
    }
    assert(soi2 > 0)
    val bad = avi.clone()
    bad(soi2 + 2) = 0x00 // SOI no longer followed by a marker
    assert(!Avi.decode(bad).valid)
  }

  test("videoFrameStats: map-only Dataset plumbing over synthesized clips") {
    val s = spark
    import s.implicits._
    val payloads = (0L until 6L).map { id =>
      val frames = (0 until (2 + id % 3).toInt).map(f => flatFrame(1, 1, f + id.toInt))
      (id, Avi.encodeMjpeg(8, 8, 40000, frames))
    } :+ ((6L, Array.fill[Byte](32)(0x7f))) // one malformed clip
    val df = payloads.toDF("doc_id", "payload").repartition(3)
    val out = Multimodal.videoFrameStats(df, step = 2).collect()
      .sortBy(_.doc_id)
    assert(out.length === 7)
    assert(out.take(6).forall(_.valid))
    assert(!out(6).valid)
    val v0 = Avi.decode(payloads.head._2, step = 2)
    assert(out.head.sum_r === v0.sumR && out.head.n_sampled === v0.nSampled)
  }
}
