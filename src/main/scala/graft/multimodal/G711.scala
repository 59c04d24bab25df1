package graft.multimodal

/** ITU-T G.711 companded telephony codecs — μ-law (PCMU) and A-law
  * (PCMA) sample decode, the first LOSSY audio codecs in the real-
  * decode tier (they are logarithmic 8-bit quantizations of 16-bit
  * PCM; decode is exact integer arithmetic from the published
  * standard, no native library involved). Carried in the WAV
  * container as audioFormat 7 (μ-law) / 6 (A-law); `Wav.decode`
  * routes those formats here, shrinking the declared audio stub
  * tier to genuinely transform-coded codecs (MP3/AAC sample decode).
  *
  * Formulas are the classic CCITT reference expansions (BIAS 0x84,
  * quantization mask 0xf, segment mask 0x70): every step is shift/
  * add/xor on integers, so a SQL oracle mirrors the decode
  * bit-for-bit (q105 reconstructs whole-corpus sample statistics
  * from the synthesis arithmetic).
  */
object G711 {

  /** μ-law byte → linear PCM (±32124 max). */
  def ulaw2linear(b: Byte): Int = {
    val u = ~b & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear PCM (±32256 max; sign bit SET means
    * positive in A-law, the inverse of μ-law's convention).
    */
  def alaw2linear(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }
}
