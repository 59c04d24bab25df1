package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** EBML/Matroska walk — knob-space round trips (float32/float64
  * duration, unknown segment size, Void skipping, video/audio arms),
  * first-track-wins on a hand-built two-track file, keyframe flags,
  * vint edge widths, truncation/corruption fuzz.
  */
class MatroskaSpec extends AnyFunSuite {

  private def params(id: Long): Matroska.MkvParams = {
    val nc = (1 + id % 3).toInt
    Matroska.MkvParams(
      docType = if (id % 2 == 0) "webm" else "matroska",
      timestampScale = if (id % 3 == 0) 500000L else 1000000L,
      durationUnits = 1000 + id % 50,
      float32Duration = id % 4 == 1,
      video = id % 2 == 0,
      codecId = if (id % 2 == 0) "V_VP9" else "A_OPUS",
      width = (16 + id % 8).toInt, height = (9 + id % 5).toInt,
      channels = (1 + id % 2).toInt,
      clusterBlocks = (0 until nc).map { c =>
        (0 until (1 + (id + c) % 4).toInt).map { b =>
          (((id + 3 * c + 2 * b) % 40).toInt, (b + c + id) % 3 == 0)
        }
      },
      unknownSegmentSize = id % 7 == 2,
      insertVoid = id % 5 == 3,
      seed = id)
  }

  test("round trip across the knob space") {
    (0L until 60L).foreach { id =>
      val p = params(id)
      val m = Matroska.decode(Matroska.encode(p))
      assert(m.valid, s"id=$id invalid")
      assert(m.docType === p.docType && m.timestampScale === p.timestampScale)
      assert(m.durationMs === p.durationUnits * p.timestampScale / 1000000L, s"id=$id dur")
      assert(m.nTracks === 1 && m.trackType === (if (p.video) 1L else 2L))
      assert(m.codecId === p.codecId)
      if (p.video) assert(m.width === p.width.toLong && m.height === p.height.toLong)
      else assert(m.channels === p.channels.toLong && m.width === 0L)
      assert(m.nClusters === p.clusterBlocks.size.toLong)
      assert(m.nBlocks === p.clusterBlocks.map(_.size).sum.toLong)
      assert(m.nKeyframes === p.clusterBlocks.flatten.count(_._2).toLong, s"id=$id keys")
    }
  }

  test("float32 and float64 duration arms agree on integral units") {
    val p = params(8L)
    val f64 = Matroska.decode(Matroska.encode(p.copy(float32Duration = false)))
    val f32 = Matroska.decode(Matroska.encode(p.copy(float32Duration = true)))
    assert(f64.durationMs === f32.durationMs)
  }

  test("a second TrackEntry is counted but its fields do not overwrite the first") {
    val base = params(2L) // video first track
    val bytes = Matroska.encode(base)
    // hand-build a second, audio TrackEntry and splice it into Tracks
    val second = Matroska.element(Matroska.IdTrackEntry,
      Matroska.element(Matroska.IdTrackType, Matroska.beUint(2L)) ++
        Matroska.element(Matroska.IdCodecId, "A_OPUS".getBytes("UTF-8")))
    // rebuild the whole file with a two-entry Tracks by re-encoding:
    // locate the Tracks element is brittle; instead construct directly
    val p = base
    val info = {
      val m = Matroska.decode(bytes); assert(m.valid); m
    }
    val durBits = java.lang.Double.doubleToLongBits(p.durationUnits.toDouble)
    val durBytes = Array.tabulate[Byte](8)(i => ((durBits >>> (8 * (7 - i))) & 0xff).toByte)
    val infoEl = Matroska.element(0x1549A966L,
      Matroska.element(0x2AD7B1L, Matroska.beUint(p.timestampScale)) ++
        Matroska.element(0x4489L, durBytes))
    val firstTrack = Matroska.element(Matroska.IdTrackEntry,
      Matroska.element(Matroska.IdTrackType, Matroska.beUint(1L)) ++
        Matroska.element(Matroska.IdCodecId, "V_VP9".getBytes("UTF-8")))
    val tracks = Matroska.element(Matroska.IdTracks, firstTrack ++ second)
    val file = Matroska.element(Matroska.IdEbml,
      Matroska.element(Matroska.IdDocType, "webm".getBytes("UTF-8"))) ++
      Matroska.element(Matroska.IdSegment, infoEl ++ tracks)
    val m = Matroska.decode(file)
    assert(m.valid && m.nTracks === 2)
    assert(m.trackType === 1L && m.codecId === "V_VP9", "first track wins")
    assert(info.nTracks === 1)
  }

  test("unknown elements are skipped by size; unknown-size unknowns are invalid") {
    val m = Matroska.decode(Matroska.encode(params(3L))) // insertVoid arm
    assert(m.valid)
    // a file whose only content is an unknown element of unknown size
    val out = ArrayBuffer.empty[Byte]
    Matroska.vintId(out, Matroska.IdEbml)
    out += 0xff.toByte
    assert(!Matroska.decode(out.toArray ++ Array[Byte](0x42, 0x42)).valid)
  }

  test("truncation at every prefix is invalid, never a throw (known segment size)") {
    // id=12: 12%7=5, so the segment size is KNOWN — every truncation
    // breaks a declared bound. (With an unknown-size segment a
    // truncation at an element boundary is undetectable by design:
    // EBML has no end marker — that arm is covered by round trips.)
    val bytes = Matroska.encode(params(12L))
    (0 until bytes.length).foreach { n =>
      val m = Matroska.decode(bytes.take(n))
      assert(!m.valid, s"prefix $n")
    }
    assert(!Matroska.decode(Array.emptyByteArray).valid)
    assert(!Matroska.decode("EBML? hardly.".getBytes).valid)
  }

  test("bit corruption never throws") {
    val bytes = Matroska.encode(params(14L))
    (0 until bytes.length).foreach { i =>
      val c = bytes.clone()
      c(i) = (c(i) ^ 0x80).toByte
      Matroska.decode(c) // validity depends on the bit; must not throw
    }
  }
}
