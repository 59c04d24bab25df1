package graft.multimodal

import java.nio.ByteBuffer

/** Minimal ISO-BMFF (MP4, ISO/IEC 14496-12) container walk — the
  * OTHER major container family: RIFF (little-endian, WAV/AVI) is
  * covered by the audio/video tiers; the MP4/MOV/HEIF world is
  * big-endian nested boxes, and every modern crawl's video/audio
  * attachments arrive in it. Sample DATA stays on the declared
  * native-stub tier (H.264/AAC, same no-ground-truth reason as
  * MP3/AAC — SURVEY §6); what a 100 TB curation pipeline needs from
  * MP4 FIRST is the container metadata walk: duration, track
  * handlers, sample counts/sizes, keyframe density — the route/
  * filter/sample decisions (drop clips under 2 s, sample k keyframes,
  * cap bytes/sample) all run on exactly these fields, long before any
  * codec work.
  *
  * Reference tie-in: the reference's extractor tier routes documents
  * by magic bytes (`BetterVersion/azure_ocr_extractor.py`); ISO-BMFF
  * routes on the `ftyp` box exactly as RIFF routes on its fourcc.
  *
  * Grammar (14496-12 §4): box = uint32 size (big-endian) + 4-byte
  * type; size==1 → uint64 largesize follows; size==0 → box extends to
  * end of file. Containers (moov/trak/mdia/minf/stbl) nest; FullBoxes
  * carry version+flags, and version 1 widens times to 64-bit
  * (mvhd/mdhd — both versions parsed). Unknown boxes are SKIPPED by
  * size (free/udta/uuid — the extension rule that makes the format
  * evolvable). Malformed payloads yield an invalid row, never an
  * exception.
  */
object Mp4 {

  /** Container metadata for one payload; `valid=false` rows carry
    * zeros/empty. Durations are integer-exact: units·1000/timescale
    * floor division. `nKeyframes` falls back to `nSamples` when no
    * `stss` box is present (the spec's "all samples are sync" rule).
    */
  final case class Mp4Info(
      movieTimescale: Int, durationMs: Long, nTracks: Int,
      handler: String, mediaTimescale: Int, mediaDurationMs: Long,
      nSamples: Int, nKeyframes: Int, sumSampleBytes: Long,
      maxSampleBytes: Int, valid: Boolean)

  private val Invalid =
    Mp4Info(0, 0L, 0, "", 0, 0L, 0, 0, 0L, 0, valid = false)

  /** Writer knobs; `syncSamples` are 1-based sample numbers (None →
    * omit stss: every sample is sync). `version1` exercises the
    * 64-bit mvhd/mdhd arms; `addFreeBox` inserts a skip-me box
    * between ftyp and moov.
    */
  final case class Mp4Params(
      movieTimescale: Int, movieDurationUnits: Long,
      mediaTimescale: Int, sampleDeltaUnits: Int,
      handler: String, sampleFormat: String,
      sampleSizes: Seq[Int], syncSamples: Option[Seq[Int]],
      version1: Boolean, addFreeBox: Boolean)

  /** Encode a one-track MP4: ftyp [free] mdat moov(mvhd trak(tkhd
    * mdia(mdhd hdlr minf(stbl(stsd stts stsc stsz stco [stss]))))).
    * Sample payload bytes are (i % 251) fillers — the sample DATA is
    * opaque to the container tier by design.
    */
  def encode(p: Mp4Params): Array[Byte] = {
    require(p.sampleSizes.nonEmpty, "need at least one sample")
    require(p.movieTimescale > 0 && p.mediaTimescale > 0, "bad timescale")
    require(p.handler.length == 4 && p.sampleFormat.length == 4, "fourcc must be 4 chars")
    val n = p.sampleSizes.length
    def box(tp: String, content: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + content.length)
      b.putInt(8 + content.length).put(tp.getBytes("US-ASCII")).put(content)
      b.array()
    }
    def full(tp: String, version: Int, content: Array[Byte]): Array[Byte] =
      box(tp, ByteBuffer.allocate(4 + content.length)
        .putInt(version << 24).put(content).array())

    val ftyp = box("ftyp", ByteBuffer.allocate(16)
      .put("isom".getBytes("US-ASCII")).putInt(512)
      .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII")).array())
    val free =
      if (p.addFreeBox) Some(box("free", Array.fill[Byte](12)(0x5a))) else None

    val mdatPayload = {
      val total = p.sampleSizes.map(_.toLong).sum
      require(total <= Int.MaxValue - 64, s"mdat too large: $total")
      Array.tabulate[Byte](total.toInt)(i => (i % 251).toByte)
    }
    val mdat = box("mdat", mdatPayload)

    val mediaDurationUnits = n.toLong * p.sampleDeltaUnits
    val mvhd =
      if (p.version1) full("mvhd", 1, ByteBuffer.allocate(8 + 8 + 4 + 8 + 80)
        .putLong(0L).putLong(0L).putInt(p.movieTimescale).putLong(p.movieDurationUnits)
        .putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](74)).array())
      else full("mvhd", 0, ByteBuffer.allocate(4 + 4 + 4 + 4 + 80)
        .putInt(0).putInt(0).putInt(p.movieTimescale).putInt(p.movieDurationUnits.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](74)).array())
    val tkhd = full("tkhd", 0, ByteBuffer.allocate(84)
      .putInt(0).putInt(0).putInt(1).putInt(0).putInt(p.movieDurationUnits.toInt)
      .put(new Array[Byte](64)).array())
    val mdhd =
      if (p.version1) full("mdhd", 1, ByteBuffer.allocate(8 + 8 + 4 + 8 + 4)
        .putLong(0L).putLong(0L).putInt(p.mediaTimescale).putLong(mediaDurationUnits)
        .putShort(0x55c4.toShort).putShort(0).array()) // language "und"
      else full("mdhd", 0, ByteBuffer.allocate(4 + 4 + 4 + 4 + 4)
        .putInt(0).putInt(0).putInt(p.mediaTimescale).putInt(mediaDurationUnits.toInt)
        .putShort(0x55c4.toShort).putShort(0).array())
    val hdlr = full("hdlr", 0, ByteBuffer.allocate(4 + 4 + 12 + 1)
      .putInt(0).put(p.handler.getBytes("US-ASCII"))
      .put(new Array[Byte](12)).put(0.toByte).array())
    val stsd = full("stsd", 0, {
      val entry = ByteBuffer.allocate(16)
        .putInt(16).put(p.sampleFormat.getBytes("US-ASCII"))
        .put(new Array[Byte](6)).putShort(1).array()
      ByteBuffer.allocate(4 + entry.length).putInt(1).put(entry).array()
    })
    val stts = full("stts", 0, ByteBuffer.allocate(4 + 8)
      .putInt(1).putInt(n).putInt(p.sampleDeltaUnits).array())
    val stsc = full("stsc", 0, ByteBuffer.allocate(4 + 12)
      .putInt(1).putInt(1).putInt(n).putInt(1).array())
    val stsz = full("stsz", 0, {
      val b = ByteBuffer.allocate(4 + 4 + 4 * n).putInt(0).putInt(n)
      p.sampleSizes.foreach(b.putInt)
      b.array()
    })
    val stss = p.syncSamples.map { ss =>
      val b = ByteBuffer.allocate(4 + 4 * ss.length).putInt(ss.length)
      ss.foreach(b.putInt)
      full("stss", 0, b.array())
    }
    // stco needs mdat's payload offset: ftyp [free] mdat-header
    val mdatPayloadOff = ftyp.length + free.map(_.length).getOrElse(0) + 8
    val stco = full("stco", 0, ByteBuffer.allocate(8)
      .putInt(1).putInt(mdatPayloadOff).array())

    def container(tp: String, children: Seq[Array[Byte]]): Array[Byte] =
      box(tp, children.reduce(_ ++ _))
    val stbl = container("stbl", Seq(stsd, stts, stsc, stsz) ++ stss.toSeq :+ stco)
    val minf = container("minf", Seq(stbl))
    val mdia = container("mdia", Seq(mdhd, hdlr, minf))
    val trak = container("trak", Seq(tkhd, mdia))
    val moov = container("moov", Seq(mvhd, trak))
    Seq(Some(ftyp), free, Some(mdat), Some(moov)).flatten.reduce(_ ++ _)
  }

  /** Parse the container; malformed → invalid row, never a throw. */
  def decode(bytes: Array[Byte]): Mp4Info = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => Invalid }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Mp4Info = {
    if (bytes == null || bytes.length < 16) return Invalid
    val buf = ByteBuffer.wrap(bytes)
    def tagAt(off: Int): String = new String(bytes, off, 4, "US-ASCII")

    var ftypSeen = false
    var movieTimescale = 0
    var movieDuration = -1L
    var nTracks = 0
    // first trak wins for the per-track fields
    var handler = ""
    var mediaTimescale = 0
    var mediaDuration = -1L
    var nSamples = -1
    var sumSampleBytes = 0L
    var maxSampleBytes = 0
    var stssCount = -1

    val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    // Walk one box level [from, to); returns false on structural damage.
    def walk(from: Long, to: Long, inFirstTrak: Boolean): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val size32 = buf.getInt(p.toInt).toLong & 0xffffffffL
        val tp = tagAt(p.toInt + 4)
        var header = 8L
        val size =
          if (size32 == 1L) {
            if (p + 16 > to) return false
            header = 16L
            buf.getLong(p.toInt + 8)
          } else if (size32 == 0L) to - p // extends to end of enclosing box
          else size32
        if (size < header || p + size > to) return false
        val body = p + header
        val end = p + size
        tp match {
          case "ftyp" => ftypSeen = true
          case t if containers.contains(t) =>
            val firstTrak =
              if (t == "trak") { nTracks += 1; nTracks == 1 }
              else inFirstTrak
            if (!walk(body, end, firstTrak)) return false
          case "mvhd" if end - body >= 4 =>
            val v = bytes(body.toInt) & 0xff
            if (v == 1 && end - body >= 32) {
              movieTimescale = buf.getInt(body.toInt + 20)
              movieDuration = buf.getLong(body.toInt + 24)
            } else if (v == 0 && end - body >= 20) {
              movieTimescale = buf.getInt(body.toInt + 12)
              movieDuration = buf.getInt(body.toInt + 16).toLong & 0xffffffffL
            } else return false
          case "mdhd" if inFirstTrak && end - body >= 4 =>
            val v = bytes(body.toInt) & 0xff
            if (v == 1 && end - body >= 32) {
              mediaTimescale = buf.getInt(body.toInt + 20)
              mediaDuration = buf.getLong(body.toInt + 24)
            } else if (v == 0 && end - body >= 20) {
              mediaTimescale = buf.getInt(body.toInt + 12)
              mediaDuration = buf.getInt(body.toInt + 16).toLong & 0xffffffffL
            } else return false
          case "hdlr" if inFirstTrak && end - body >= 12 =>
            handler = tagAt(body.toInt + 8)
          case "stsz" if inFirstTrak && end - body >= 12 =>
            val fixed = buf.getInt(body.toInt + 4)
            val cnt = buf.getInt(body.toInt + 8)
            if (cnt < 0) return false
            nSamples = cnt
            if (fixed != 0) {
              sumSampleBytes = fixed.toLong * cnt
              maxSampleBytes = if (cnt > 0) fixed else 0
            } else {
              if (end - body < 12L + 4L * cnt) return false
              var i = 0
              while (i < cnt) {
                val sz = buf.getInt(body.toInt + 12 + 4 * i)
                if (sz < 0) return false
                sumSampleBytes += sz
                if (sz > maxSampleBytes) maxSampleBytes = sz
                i += 1
              }
            }
          case "stss" if inFirstTrak && end - body >= 8 =>
            stssCount = buf.getInt(body.toInt + 4)
            if (stssCount < 0 || end - body < 8L + 4L * stssCount) return false
          case _ => () // unknown box (free/udta/uuid/mdat/…): skip by size
        }
        p = end
      }
      true
    }
    if (!walk(0L, bytes.length.toLong, inFirstTrak = false)) return Invalid

    if (!ftypSeen || movieTimescale <= 0 || movieDuration < 0 || nTracks == 0 ||
      handler.isEmpty || mediaTimescale <= 0 || mediaDuration < 0 || nSamples < 0)
      return Invalid
    val nKeyframes = if (stssCount >= 0) stssCount else nSamples
    Mp4Info(
      movieTimescale, movieDuration * 1000L / movieTimescale, nTracks,
      handler, mediaTimescale, mediaDuration * 1000L / mediaTimescale,
      nSamples, nKeyframes, sumSampleBytes, maxSampleBytes, valid = true)
  }
}
