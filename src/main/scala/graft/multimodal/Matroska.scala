package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Matroska / WebM container walk (EBML, RFC 8794 + the public
  * Matroska element registry) — the FOURTH container grammar in the
  * multimodal tier: RIFF chunks (WAV/AVI, little-endian), ISO-BMFF
  * boxes (MP4, big-endian), Ogg pages (CRC + lacing), and now EBML's
  * variable-length-integer TLV tree, the framing WebM video in web
  * crawls actually ships in. As with q99/q173/q181 this is the
  * pre-codec metadata tier — doc type, timestamp scale, exact
  * duration, track identity, cluster/block/keyframe counts: the
  * route/filter/sample decisions a 100 TB pipeline makes BEFORE any
  * codec runs. VP9/Opus SAMPLE decode stays on the declared
  * native-stub tier (SURVEY §6, the MP3/AAC no-ground-truth reason).
  *
  * Covered grammar, every arm exercised by the writer sweep + spec:
  *  - VINT ids (marker bit kept, 1-4 bytes) and VINT sizes (marker
  *    removed, 1-8 bytes), including the ALL-ONES unknown-size form
  *    on Segment (live-muxed files end at EOF);
  *  - recursive master elements with unknown-element SKIPPING by
  *    size (Void and any unregistered id — the rule that makes the
  *    format evolvable);
  *  - big-endian uints of any width ≤ 8, FLOAT32 and FLOAT64 scalar
  *    elements (Duration), UTF-8 strings (DocType, CodecID);
  *  - SimpleBlock internals: track VINT, signed 16-bit relative
  *    timestamp, the keyframe flag bit.
  */
object Matroska {

  final case class MkvInfo(
      docType: String, timestampScale: Long, durationMs: Long,
      nTracks: Int, trackType: Long, codecId: String,
      width: Long, height: Long, channels: Long,
      nClusters: Long, nBlocks: Long, nKeyframes: Long, valid: Boolean)

  private val Invalid =
    MkvInfo("", 0L, 0L, 0, 0L, "", 0L, 0L, 0L, 0L, 0L, 0L, valid = false)

  // element ids (marker bit kept, as they appear on the wire)
  private[multimodal] val IdEbml = 0x1A45DFA3L
  private[multimodal] val IdDocType = 0x4282L
  private[multimodal] val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private[multimodal] val IdTracks = 0x1654AE6BL
  private[multimodal] val IdTrackEntry = 0xAEL
  private[multimodal] val IdTrackType = 0x83L
  private[multimodal] val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdSimpleBlock = 0xA3L
  private val IdVoid = 0xECL

  // ---- writer ----

  final case class MkvParams(
      docType: String, timestampScale: Long, durationUnits: Long,
      float32Duration: Boolean, video: Boolean, codecId: String,
      width: Int, height: Int, channels: Int,
      clusterBlocks: Seq[Seq[(Int, Boolean)]], // per cluster: (frameBytes, keyframe)
      unknownSegmentSize: Boolean, insertVoid: Boolean, seed: Long = 0L)

  private[multimodal] def vintId(out: ArrayBuffer[Byte], id: Long): Unit = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    var i = len - 1
    while (i >= 0) { out += ((id >>> (8 * i)) & 0xff).toByte; i -= 1 }
  }

  /** Size vint, width chosen minimally (marker bit added). */
  private[multimodal] def vintSize(out: ArrayBuffer[Byte], v: Long): Unit = {
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1 // avoid the all-ones reserved form
    val marked = v | (1L << (7 * len))
    var i = len - 1
    while (i >= 0) { out += ((marked >>> (8 * i)) & 0xff).toByte; i -= 1 }
  }

  private[multimodal] def beUint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate[Byte](len)(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private[multimodal] def element(id: Long, payload: Array[Byte]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    vintId(out, id)
    vintSize(out, payload.length.toLong)
    out ++= payload
    out.toArray
  }

  def encode(p: MkvParams): Array[Byte] = {
    val header = element(IdEbml,
      element(IdDocType, p.docType.getBytes("UTF-8")))
    val durBytes =
      if (p.float32Duration) {
        val bits = java.lang.Float.floatToIntBits(p.durationUnits.toFloat)
        Array.tabulate[Byte](4)(i => ((bits >>> (8 * (3 - i))) & 0xff).toByte)
      } else {
        val bits = java.lang.Double.doubleToLongBits(p.durationUnits.toDouble)
        Array.tabulate[Byte](8)(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte)
      }
    val info = element(IdInfo,
      element(IdTimestampScale, beUint(p.timestampScale)) ++
        element(IdDuration, durBytes))
    val trackDetail =
      if (p.video) element(IdVideo,
        element(IdPixelWidth, beUint(p.width.toLong)) ++
          element(IdPixelHeight, beUint(p.height.toLong)))
      else element(IdAudio, element(IdChannels, beUint(p.channels.toLong)))
    val tracks = element(IdTracks, element(IdTrackEntry,
      element(IdTrackType, beUint(if (p.video) 1L else 2L)) ++
        element(IdCodecId, p.codecId.getBytes("UTF-8")) ++ trackDetail))
    val voidEl = if (p.insertVoid)
      element(IdVoid, Array.fill[Byte](7)(0x55)) else Array.emptyByteArray
    var off = 0
    val clusters = p.clusterBlocks.zipWithIndex.map { case (blocks, ci) =>
      val body = ArrayBuffer.empty[Byte]
      blocks.foreach { case (frameBytes, key) =>
        val blk = ArrayBuffer.empty[Byte]
        blk += 0x81.toByte // track 1 as a 1-byte vint
        blk += ((ci >> 8) & 0xff).toByte // relative timestamp (int16 BE)
        blk += (ci & 0xff).toByte
        blk += (if (key) 0x80 else 0x00).toByte // flags: keyframe bit
        var i = 0
        while (i < frameBytes) {
          blk += ((p.seed * 17 + (off + i) * 5 + 3) & 0xff).toByte; i += 1
        }
        off += frameBytes
        body ++= element(IdSimpleBlock, blk.toArray)
      }
      element(IdCluster, body.toArray)
    }
    val segBody = info ++ voidEl ++ tracks ++ clusters.flatten
    val seg = if (p.unknownSegmentSize) {
      val out = ArrayBuffer.empty[Byte]
      vintId(out, IdSegment)
      out += 0xff.toByte // 1-byte all-ones size vint: unknown, to EOF
      out ++= segBody
      out.toArray
    } else element(IdSegment, segBody)
    header ++ seg
  }

  // ---- reader ----

  private final class Walk(val b: Array[Byte]) {
    var pos = 0
    def atEnd(limit: Int): Boolean = pos >= limit
    /** (value, keepMarker) vint read; throws on truncation/zero lead. */
    def vint(keepMarker: Boolean): Long = {
      val first = b(pos) & 0xff
      if (first == 0) throw new IllegalArgumentException("vint lead byte 0")
      var len = 1
      while ((first & (0x100 >> len)) == 0) len += 1
      var v = if (keepMarker) first.toLong
        else (first & (0xff >> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
      pos += len
      v
    }
    /** Size vint: returns −1 for the reserved all-ones (unknown). */
    def size(): Long = {
      val first = b(pos) & 0xff
      var len = 1
      while (len <= 8 && (first & (0x100 >> len)) == 0) len += 1
      val v = vint(keepMarker = false)
      if (v == (1L << (7 * len)) - 1) -1L else v
    }
  }

  private def beUintOf(b: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (b(from + i) & 0xff); i += 1 }
    v
  }

  def decode(bytes: Array[Byte]): MkvInfo =
    try decodeUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) |
                 (_: ArrayIndexOutOfBoundsException) => Invalid }

  private def decodeUnsafe(bytes: Array[Byte]): MkvInfo = {
    val w = new Walk(bytes)
    var docType = ""
    var tsScale = 1000000L // the spec default
    var durationUnits = -1.0
    var nTracks = 0
    var trackType = 0L
    var codecId = ""
    var width = 0L
    var height = 0L
    var channels = 0L
    var nClusters = 0L
    var nBlocks = 0L
    var nKeys = 0L
    var sawHeader = false
    var sawSegment = false

    def walkMaster(limit: Int, depth: Int, inside: Long): Unit = {
      while (!w.atEnd(limit)) {
        val id = w.vint(keepMarker = true)
        val sz = w.size()
        val end = if (sz < 0) limit else w.pos + sz.toInt
        if (sz >= 0 && end > limit)
          throw new IllegalArgumentException("element overruns parent")
        id match {
          case IdEbml =>
            sawHeader = true; walkMaster(end, depth + 1, id)
          case IdSegment =>
            sawSegment = true; walkMaster(end, depth + 1, id)
          case IdInfo | IdTracks | IdVideo | IdAudio =>
            walkMaster(end, depth + 1, id)
          case IdTrackEntry =>
            nTracks += 1; walkMaster(end, depth + 1, id)
          case IdCluster =>
            nClusters += 1; walkMaster(end, depth + 1, id)
          case IdDocType if inside == IdEbml =>
            docType = new String(bytes, w.pos, sz.toInt, "UTF-8"); w.pos = end
          case IdTimestampScale if inside == IdInfo =>
            tsScale = beUintOf(bytes, w.pos, sz.toInt); w.pos = end
          case IdDuration if inside == IdInfo =>
            durationUnits = sz match {
              case 4 => java.lang.Float.intBitsToFloat(
                beUintOf(bytes, w.pos, 4).toInt).toDouble
              case 8 => java.lang.Double.longBitsToDouble(beUintOf(bytes, w.pos, 8))
              case _ => throw new IllegalArgumentException(s"float size $sz")
            }
            w.pos = end
          case IdTrackType if inside == IdTrackEntry && nTracks == 1 =>
            trackType = beUintOf(bytes, w.pos, sz.toInt); w.pos = end
          case IdCodecId if inside == IdTrackEntry && nTracks == 1 =>
            codecId = new String(bytes, w.pos, sz.toInt, "UTF-8"); w.pos = end
          case IdPixelWidth if inside == IdVideo && nTracks == 1 =>
            width = beUintOf(bytes, w.pos, sz.toInt); w.pos = end
          case IdPixelHeight if inside == IdVideo && nTracks == 1 =>
            height = beUintOf(bytes, w.pos, sz.toInt); w.pos = end
          case IdChannels if inside == IdAudio && nTracks == 1 =>
            channels = beUintOf(bytes, w.pos, sz.toInt); w.pos = end
          case IdSimpleBlock if inside == IdCluster =>
            nBlocks += 1
            val blockStart = w.pos
            w.vint(keepMarker = false) // track number
            w.pos += 2 // relative timestamp
            if ((bytes(w.pos) & 0x80) != 0) nKeys += 1
            w.pos = blockStart + sz.toInt
            if (w.pos != end) throw new IllegalArgumentException("block size")
          case _ =>
            // unknown element (Void, unregistered ids): skip by size —
            // an unknown-SIZE unknown element is unrecoverable
            if (sz < 0) throw new IllegalArgumentException("unknown element of unknown size")
            w.pos = end
        }
      }
      if (w.pos != limit)
        throw new IllegalArgumentException("parse overran the parent bound")
    }

    walkMaster(bytes.length, 0, 0L)
    if (!sawHeader || !sawSegment || docType.isEmpty || durationUnits < 0 ||
      tsScale <= 0) return Invalid
    // exact-integer duration: the fixture writes integral unit counts,
    // so the float round-trips exactly and the ms math is pure longs
    val durMs = durationUnits.toLong * tsScale / 1000000L
    MkvInfo(docType, tsScale, durMs, nTracks, trackType, codecId,
      width, height, channels, nClusters, nBlocks, nKeys, valid = true)
  }
}
