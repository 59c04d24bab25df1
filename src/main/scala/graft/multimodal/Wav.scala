package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE PCM codec — REAL audio decode with zero native
  * dependencies (the WAV container and 16-bit PCM are fully specified
  * public formats; parsing them needs only little-endian arithmetic).
  * This is the audio leg of the multimodal surface: where images get
  * header-dims + ImageIO resize, audio gets container parse + sample
  * statistics, leaving only genuinely-native codec SAMPLE decode
  * (MP3 — whose frame-header/duration tier is real, see `Mp3` —
  * plus AAC/opus) as
  * declared stubs.
  *
  * Decode walks the chunk list (fmt /data may be preceded by LIST or
  * fact chunks), validates RIFF/WAVE magics and PCM format, and folds
  * the 16-bit samples into EXACT integer statistics (sum of squares,
  * peak absolute amplitude) — integer outputs are engine-portable, so
  * the q64 oracle can reconstruct them bit-for-bit; doubles like RMS
  * are one division+sqrt away for callers that want them.
  */
object Wav {

  /** Exact integer decode result; `valid=false` rows carry zeros
    * (crawl-scale contract: malformed payloads yield a row, never an
    * exception).
    */
  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, durationMs: Long, sumSq: Long, peakAbs: Long,
      valid: Boolean)

  private val Invalid = WavInfo(0, 0, 0, 0L, 0L, 0L, 0L, valid = false)

  /** Encode 16-bit PCM mono samples as a standard 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Encode G.711 companded bytes (audioFormat 7 = μ-law, 6 = A-law)
    * as a standard WAV: 8 bits per sample, block align 1.
    */
  def encodeG711(sampleRate: Int, samples: Array[Byte], audioFormat: Int): Array[Byte] = {
    require(audioFormat == 6 || audioFormat == 7, s"not a G.711 format: $audioFormat")
    val buf = ByteBuffer.allocate(44 + samples.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(audioFormat.toShort)
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 byte/sample)
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
    buf.put(samples)
    buf.array()
  }

  /** Encode IMA ADPCM blocks (audioFormat 17, mono) as a standard
    * WAV: each block is (predictor₀, stepIndex₀, nibble bytes); the
    * fmt chunk carries the conventional cbSize=2 + samplesPerBlock
    * extension. All blocks must have blockAlign−4 data bytes except
    * optionally the last (short final block).
    */
  def encodeAdpcm(sampleRate: Int, blocks: Seq[(Int, Int, Array[Byte])], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 5, s"blockAlign too small: $blockAlign")
    blocks.dropRight(1).foreach(b =>
      require(b._3.length == blockAlign - 4, "non-final block must fill blockAlign"))
    val dataLen = blocks.map(4 + _._3.length).sum
    val buf = ByteBuffer.allocate(48 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    buf.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17) // IMA ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // approx byte rate
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    blocks.foreach { case (pred0, idx0, data) =>
      buf.putShort(pred0.toShort).put(idx0.toByte).put(0.toByte).put(data)
    }
    buf.array()
  }

  /** Parse a WAV payload into exact integer statistics. PCM 16-bit
    * (format 1) samples fold directly; G.711 μ-law/A-law (formats
    * 7/6, 8-bit) expand through `G711` first, so the statistics are
    * over the DECODED linear samples; IMA ADPCM (format 17) replays
    * the predictor recurrence per block.
    */
  def decode(bytes: Array[Byte]): WavInfo = {
    if (bytes == null || bytes.length < 44) return Invalid
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return Invalid
    buf.getInt // declared riff size; trust actual array bounds instead
    if (tag() != "WAVE") return Invalid
    var sampleRate = 0; var channels = 0; var bits = 0
    var audioFmt = 0
    var blockAlign = 0
    var fmtSeen = false
    // walk chunks until the data chunk (fmt may be preceded by LIST/fact)
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return Invalid
      id match {
        case "fmt " =>
          if (size < 16) return Invalid
          val p0 = buf.position()
          val audioFormat = buf.getShort
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          blockAlign = buf.getShort.toInt
          bits = buf.getShort.toInt
          val okFmt = (audioFormat == 1 && bits == 16) ||
            ((audioFormat == 6 || audioFormat == 7) && bits == 8) ||
            (audioFormat == 17 && bits == 4 && channels == 1 && blockAlign >= 5)
          if (!okFmt || channels < 1 || sampleRate <= 0)
            return Invalid // PCM16 + G.711 + mono IMA ADPCM; others declared out of scope
          audioFmt = audioFormat
          fmtSeen = true
          buf.position(p0 + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          if (!fmtSeen) return Invalid
          var sumSq = 0L; var peak = 0L
          var n = 0L
          def fold(s: Long): Unit = {
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            n += 1
          }
          if (audioFmt == 17) {
            // IMA ADPCM: consecutive blockAlign-sized blocks, each a
            // 4-byte header (predictor int16, step index, reserved —
            // the header IS sample 0) + two nibbles per data byte,
            // low nibble first. A short final block decodes with the
            // bytes it has.
            var off = 0
            while (off + 4 <= size) {
              var pred = buf.getShort.toInt
              var idx = buf.get() & 0xff
              buf.get() // reserved
              if (idx > 88) return Invalid
              fold(pred.toLong)
              val dataBytes = math.min(blockAlign, size - off) - 4
              var j = 0
              while (j < dataBytes) {
                val b = buf.get() & 0xff
                val (p1, i1) = Adpcm.step(pred, idx, b & 0xf)
                fold(p1.toLong)
                val (p2, i2) = Adpcm.step(p1, i1, b >> 4)
                fold(p2.toLong)
                pred = p2; idx = i2
                j += 1
              }
              off += 4 + dataBytes
            }
          } else {
            val bytesPerSample = if (audioFmt == 1) 2 else 1
            val total = (size / bytesPerSample).toLong
            var i = 0L
            while (i < total) {
              fold(audioFmt match {
                case 1 => buf.getShort.toLong
                case 7 => G711.ulaw2linear(buf.get()).toLong
                case _ => G711.alaw2linear(buf.get()).toLong
              })
              i += 1
            }
          }
          val frames = n / channels
          return WavInfo(sampleRate, channels, bits,
            nSamples = frames,
            durationMs = frames * 1000L / sampleRate,
            sumSq = sumSq, peakAbs = peak, valid = true)
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    Invalid
  }
}
