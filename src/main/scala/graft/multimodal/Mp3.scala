package graft.multimodal

/** MPEG-1 Layer III (MP3) FRAME-HEADER walk — the container-metadata
  * tier for the one audio format whose sample decode is genuinely
  * native-codec-bound (hybrid filterbank + Huffman + IMDCT stay a
  * declared stub; this is the audio twin of the header-dims tier
  * images had before their pixel decoders landed): skip an ID3v2 tag
  * by its syncsafe size, sync on 0xFFE, read version/layer/bitrate/
  * samplerate/padding bits against the published MPEG-1 tables, step
  * frame-by-frame with the exact frame-length arithmetic
  * (144·bitrate/samplerate + padding), and fold frame count into
  * sample-exact duration (1152 samples per Layer III frame).
  *
  * Everything here is fixed public-specification arithmetic —
  * integer outputs, so the q99 oracle reconstructs them from the
  * synthesis parameters bit-for-bit. Malformed payloads yield an
  * invalid row, never an exception (the crawl-scale contract).
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table (kbps), index 1–14. */
  private[multimodal] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 sample-rate table (Hz), index 0–2. */
  private[multimodal] val SampleRateHz: Array[Int] = Array(44100, 48000, 32000, -1)

  final case class Mp3Info(
      nFrames: Long, bitrateKbps: Int, sampleRate: Int,
      durationMs: Long, id3Bytes: Long, valid: Boolean)

  private val Invalid = Mp3Info(0L, 0, 0, 0L, 0L, valid = false)

  /** Frame byte length for MPEG-1 Layer III: ⌊144·bitrate/rate⌋+pad. */
  private[multimodal] def frameLen(bitrateKbps: Int, rateHz: Int, padded: Boolean): Int =
    144 * bitrateKbps * 1000 / rateHz + (if (padded) 1 else 0)

  /** Build one frame header + zero-filled body (synthesis tier for
    * the q99 round trip — a real encoder's headers are identical).
    */
  def frame(bitrateIdx: Int, rateIdx: Int, padded: Boolean): Array[Byte] = {
    val len = frameLen(BitrateKbps(bitrateIdx), SampleRateHz(rateIdx), padded)
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte // 11-bit sync
    f(1) = 0xfb.toByte // sync + MPEG-1 (11) + Layer III (01) + no CRC (1)
    f(2) = ((bitrateIdx << 4) | (rateIdx << 2) | (if (padded) 2 else 0)).toByte
    f(3) = 0xc4.toByte // mono, no emphasis oddities
    f
  }

  /** A syncsafe-sized ID3v2 tag of `size` payload bytes. */
  def id3(size: Int): Array[Byte] = {
    require(size >= 0 && size < (1 << 28), "syncsafe size")
    val t = new Array[Byte](10 + size)
    t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4 // ID3v2.4
    t(6) = ((size >> 21) & 0x7f).toByte
    t(7) = ((size >> 14) & 0x7f).toByte
    t(8) = ((size >> 7) & 0x7f).toByte
    t(9) = (size & 0x7f).toByte
    t
  }

  /** Walk a payload: optional ID3v2 skip, then consecutive MPEG-1
    * Layer III frames from the first sync word. A trailing truncated
    * frame ends the walk (counted frames stay valid); zero complete
    * frames, a failed sync, or a reserved bitrate/rate index is
    * invalid. Duration is sample-exact: frames·1152·1000 DIV rate.
    */
  def parse(bytes: Array[Byte]): Mp3Info = {
    if (bytes == null || bytes.length < 4) return Invalid
    var pos = 0
    var id3Len = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      id3Len = 10L + size
      if (id3Len > bytes.length) return Invalid
      pos = id3Len.toInt
    }
    var nFrames = 0L
    var bitrate = 0
    var rate = 0
    while (pos + 4 <= bytes.length) {
      val b0 = bytes(pos) & 0xff; val b1 = bytes(pos + 1) & 0xff
      // 11-bit sync + MPEG-1 (version bits 11) + Layer III (01)
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return finish(nFrames, bitrate, rate, id3Len)
      val b2 = bytes(pos + 2) & 0xff
      val bIdx = b2 >> 4
      val rIdx = (b2 >> 2) & 0x3
      if (bIdx == 0 || bIdx == 15 || rIdx == 3) return finish(nFrames, bitrate, rate, id3Len)
      val len = frameLen(BitrateKbps(bIdx), SampleRateHz(rIdx), (b2 & 2) != 0)
      if (pos + len > bytes.length) return finish(nFrames, bitrate, rate, id3Len)
      if (nFrames == 0L) { bitrate = BitrateKbps(bIdx); rate = SampleRateHz(rIdx) }
      nFrames += 1
      pos += len
    }
    finish(nFrames, bitrate, rate, id3Len)
  }

  private def finish(nFrames: Long, bitrate: Int, rate: Int, id3Len: Long): Mp3Info =
    if (nFrames == 0L) Invalid
    else Mp3Info(nFrames, bitrate, rate,
      nFrames * 1152L * 1000L / rate, id3Len, valid = true)
}
