package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** UTF-8 byte-level hygiene for crawl ingestion — the step BEFORE any
  * text operator can run: raw crawl payloads arrive as bytes with no
  * trustworthy charset label, and feeding them to a string decoder
  * that silently replaces or (worse) a pipeline that never checks
  * poisons every downstream dedup/quality/tokenize stage.
  *
  * Three real kernels, all pure JVM:
  *
  *  - [[decodeReplacing]] — a full UTF-8 state-machine decoder with
  *    the WHATWG "maximal subpart" replacement policy (one U+FFFD per
  *    maximal invalid subsequence): overlong forms (C0/C1 leads),
  *    surrogate encodings (ED A0..BF), beyond-U+10FFFF (F4 90+ / F5+
  *    leads), lone continuations, and truncation at end of input are
  *    each rejected exactly where the spec says the sequence stops
  *    being a prefix of a valid one.
  *  - [[mojibakePairs]] — the double-encoding signature: codepoints
  *    U+00C2/U+00C3 followed by a codepoint in [U+0080, U+00BF] are
  *    what valid UTF-8 turns into after a latin-1 misdecode + UTF-8
  *    re-encode round trip ("é" → "Ã©"); counting those pairs flags
  *    mojibake documents without any language model.
  *  - [[annotate]] — the Dataset face: per-document codepoint count,
  *    invalid-sequence count, mojibake pairs, and the md5 of the
  *    repaired text. Map-only at any corpus scale (the decode-kernel
  *    contract: no shuffle, CPU-bound, linear in executors).
  */
object Utf8 {

  /** Decode with U+FFFD substitution per the WHATWG policy; returns
    * (repaired string, number of replacements emitted).
    */
  def decodeReplacing(bytes: Array[Byte]): (String, Int) = {
    if (bytes == null) return ("", 0)
    val sb = new java.lang.StringBuilder(bytes.length)
    var bad = 0
    val n = bytes.length
    var i = 0
    def cont(j: Int, lo: Int, hi: Int): Boolean =
      j < n && { val b = bytes(j) & 0xff; b >= lo && b <= hi }
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if (b0 >= 0xc2 && b0 <= 0xdf) {
        if (cont(i + 1, 0x80, 0xbf)) {
          sb.appendCodePoint(((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)); i += 2
        } else { sb.append('�'); bad += 1; i += 1 }
      } else if (b0 >= 0xe0 && b0 <= 0xef) {
        // second-byte range depends on the lead (overlong + surrogate exclusion)
        val (lo1, hi1) = b0 match {
          case 0xe0 => (0xa0, 0xbf)
          case 0xed => (0x80, 0x9f)
          case _ => (0x80, 0xbf)
        }
        if (!cont(i + 1, lo1, hi1)) { sb.append('�'); bad += 1; i += 1 }
        else if (!cont(i + 2, 0x80, 0xbf)) { sb.append('�'); bad += 1; i += 2 }
        else {
          sb.appendCodePoint(((b0 & 0xf) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
            (bytes(i + 2) & 0x3f))
          i += 3
        }
      } else if (b0 >= 0xf0 && b0 <= 0xf4) {
        val (lo1, hi1) = b0 match {
          case 0xf0 => (0x90, 0xbf)
          case 0xf4 => (0x80, 0x8f)
          case _ => (0x80, 0xbf)
        }
        if (!cont(i + 1, lo1, hi1)) { sb.append('�'); bad += 1; i += 1 }
        else if (!cont(i + 2, 0x80, 0xbf)) { sb.append('�'); bad += 1; i += 2 }
        else if (!cont(i + 3, 0x80, 0xbf)) { sb.append('�'); bad += 1; i += 3 }
        else {
          sb.appendCodePoint(((b0 & 0x7) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
            ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f))
          i += 4
        }
      } else {
        // 0x80..0xC1 (lone continuation / overlong lead) and 0xF5..0xFF
        sb.append('�'); bad += 1; i += 1
      }
    }
    (sb.toString, bad)
  }

  /** Count U+00C2/U+00C3 + [U+0080, U+00BF] codepoint pairs — the
    * latin-1-round-trip double-encoding signature.
    */
  def mojibakePairs(s: String): Int = {
    var count = 0
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((prev == 0xc2 || prev == 0xc3) && cp >= 0x80 && cp <= 0xbf) count += 1
      prev = cp
      i += Character.charCount(cp)
    }
    count
  }

  final case class Utf8Meta(
      doc_id: Long, n_codepoints: Long, n_invalid: Long, n_mojibake: Long,
      repaired_md5: String, valid: Boolean)

  /** Per-document UTF-8 hygiene report over binary payloads. */
  def annotate(df: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): Dataset[Utf8Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val (repaired, bad) = decodeReplacing(bytes)
          md.reset()
          val digest = md.digest(repaired.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          Utf8Meta(id, repaired.codePointCount(0, repaired.length).toLong, bad.toLong,
            mojibakePairs(repaired).toLong,
            digest.map(b => f"${b & 0xff}%02x").mkString, valid = bad == 0)
        }
      }
  }
}
