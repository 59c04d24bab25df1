package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI MJPEG codec — REAL video decode with zero native
  * dependencies, completing the modality set (images, audio, PDF,
  * archives — and now video). Motion-JPEG is the one mainstream video
  * format whose sample decode needs NO new math: the container is the
  * same little-endian RIFF chunk grammar as WAV (OpenDML / the
  * original Microsoft AVI spec, a published format), and every frame
  * is a complete baseline JPEG the existing `Jpeg` decoder already
  * handles (marker walk → canonical Huffman → dequant → IDCT →
  * fixed-point YCbCr→RGB, JDK-cross-checked in JpegSpec). Transform-
  * coded video (H.264/VP9/AV1) stays on the declared native-stub tier
  * for the same no-ground-truth reason as MP3/AAC (SURVEY §6); MJPEG
  * is to video what G.711/ADPCM are to audio — a real, fully
  * specified member of the family that exercises the whole pipeline
  * shape (binary payload → container walk → per-frame sample decode →
  * frame sampling → statistics).
  *
  * Reference tie-in: the reference pipeline's extractor tier routes
  * documents to per-modality decoders by magic bytes
  * (`BetterVersion/azure_ocr_extractor.py`); video arrives as RIFF
  * `AVI ` exactly as audio arrives as RIFF `WAVE`.
  *
  * Decode walks the top-level chunk list (`hdrl` for avih/strh/strf,
  * `movi` for `00dc`/`00db` frame chunks, `idx1` ignored — the movi
  * scan is authoritative), validates the MJPG/raw handler, and
  * decodes every `step`-th frame to EXACT integer pixel statistics
  * (sum per channel, peak) — the frame-sampling contract of a
  * training-data pipeline (sample k frames per clip, not all).
  * Malformed payloads yield an invalid row, never an exception.
  */
object Avi {

  /** Exact integer decode result over the SAMPLED frames;
    * `valid=false` rows carry zeros. `durationMs` is
    * nFrames·usPerFrame/1000 in integer arithmetic.
    */
  final case class AviInfo(
      width: Int, height: Int, nFrames: Int, nSampled: Int,
      durationMs: Long, sumR: Long, sumG: Long, sumB: Long,
      peak: Int, valid: Boolean)

  private val Invalid = AviInfo(0, 0, 0, 0, 0L, 0L, 0L, 0L, 0, valid = false)

  /** Encode JPEG frames as a standard single-stream MJPEG AVI:
    * RIFF(AVI ) → LIST(hdrl){avih, LIST(strl){strh, strf}} →
    * LIST(movi){00dc…} → idx1. Frame payloads must be complete
    * baseline JPEGs (e.g. from `Jpeg.encodeFlatBlocks`); all sizes
    * are even-padded per the RIFF word-alignment rule.
    */
  def encodeMjpeg(width: Int, height: Int, usPerFrame: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "empty video")
    require(usPerFrame > 0, s"bad frame period: $usPerFrame")
    def pad(n: Int): Int = n + (n & 1)
    val fourcc = "00dc".getBytes("US-ASCII")
    val moviData = 4 + frames.map(f => 8 + pad(f.length)).sum
    val idx1Data = 16 * frames.length
    val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffData = 4 + (8 + hdrlData) + (8 + moviData) + (8 + idx1Data)
    val buf = ByteBuffer.allocate(8 + riffData).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffData); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlData); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10) // AVIF_HASINDEX
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag("MJPG")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame) // scale
      .putInt(1000000)    // rate: rate/scale = fps
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
    tag("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    tag("MJPG")
    buf.putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(moviData); tag("movi")
    val offsets = new Array[Int](frames.length)
    var off = 4 // idx1 offsets are relative to the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      buf.put(fourcc).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      off += 8 + pad(f.length)
    }
    tag("idx1"); buf.putInt(idx1Data)
    frames.zipWithIndex.foreach { case (f, i) =>
      buf.put(fourcc).putInt(0x10).putInt(offsets(i)).putInt(f.length) // AVIIF_KEYFRAME
    }
    buf.array()
  }

  /** Decode an MJPEG AVI, sampling every `step`-th frame (frame 0,
    * step, 2·step, …) through the baseline JPEG decoder and folding
    * the sampled frames into exact integer statistics. A video is
    * valid only if the container parses, the stream is vids/MJPG
    * (or the fourcc variants mjpg/dmb1), every sampled frame decodes,
    * and all sampled frames agree with the header dimensions.
    */
  def decode(bytes: Array[Byte], step: Int = 1): AviInfo = {
    require(step > 0, s"bad sampling step: $step")
    try decodeOrThrow(bytes, step)
    catch { case _: Exception => Invalid }
  }

  private def decodeOrThrow(bytes: Array[Byte], step: Int): AviInfo = {
    if (bytes == null || bytes.length < 24) return Invalid
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tagAt(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (tagAt(0) != "RIFF" || tagAt(8) != "AVI ") return Invalid
    val riffEnd = math.min(bytes.length.toLong, 8L + buf.getInt(4)).toInt

    var usPerFrame = 0
    var totalFrames = 0
    var width = 0
    var height = 0
    var handlerOk = false
    val frameSpans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    // Walk one chunk level [from, to); LISTs recurse into their data.
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p + 8 <= to) {
        val ck = tagAt(p)
        val len = buf.getInt(p + 4)
        if (len < 0 || p + 8 + len > to) return // truncated: keep what parsed
        if (ck == "LIST" && len >= 4) {
          val listType = tagAt(p + 8)
          walk(p + 12, p + 8 + len, inMovi = listType == "movi")
        } else if (ck == "avih" && len >= 40) {
          usPerFrame = buf.getInt(p + 8)
          totalFrames = buf.getInt(p + 24)
          width = buf.getInt(p + 40)
          height = buf.getInt(p + 44)
        } else if (ck == "strh" && len >= 8) {
          val fccType = tagAt(p + 8)
          val fccHandler = tagAt(p + 12)
          if (fccType == "vids")
            handlerOk = fccHandler == "MJPG" || fccHandler == "mjpg" ||
              fccHandler == "dmb1"
        } else if (inMovi && len > 0 &&
          (ck.endsWith("dc") || ck.endsWith("db"))) {
          frameSpans += ((p + 8, len))
        }
        p += 8 + len + (len & 1)
      }
    }
    walk(12, riffEnd, inMovi = false)

    if (!handlerOk || usPerFrame <= 0 || width <= 0 || height <= 0 ||
      frameSpans.isEmpty) return Invalid
    val nFrames = frameSpans.length

    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var peak = 0; var nSampled = 0
    var i = 0
    while (i < nFrames) {
      val (off, len) = frameSpans(i)
      val frame = java.util.Arrays.copyOfRange(bytes, off, off + len)
      val j = Jpeg.decode(frame)
      if (!j.valid || j.width != width || j.height != height) return Invalid
      sumR += j.sumR; sumG += j.sumG; sumB += j.sumB
      if (j.peak > peak) peak = j.peak
      nSampled += 1
      i += step
    }
    val durationMs = nFrames.toLong * usPerFrame / 1000L
    AviInfo(width, height, nFrames, nSampled, durationMs,
      sumR, sumG, sumB, peak, valid = true)
  }
}
