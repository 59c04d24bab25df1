package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Ogg container walk (RFC 3533) with Vorbis identification-header
  * parsing (Xiph Vorbis I spec §4.2.2) — the third major container
  * family in the multimodal tier next to RIFF (WAV/AVI, little-endian
  * chunks) and ISO-BMFF (MP4, big-endian boxes): Ogg is PAGE-framed
  * with a segment-lacing packet layer, the layout Vorbis/Opus/Theora
  * audio in web crawls actually ships in. Like q99/q173, this is the
  * metadata tier a 100 TB pipeline reads BEFORE any codec work —
  * stream identity, channels/rate, packet counts, the granule clock
  * that gives exact duration — to route, filter and sample; Vorbis
  * SAMPLE decode (MDCT + floor/residue codebooks) stays on the
  * declared native-stub tier for the same no-ground-truth reason as
  * MP3/AAC (SURVEY §6).
  *
  * Covered grammar, each arm exercised by the writer sweep + spec:
  *  - page header: capture "OggS", version 0, header-type flags
  *    (continuation / BOS / EOS), signed 64-bit granule (−1 = no
  *    packet ends on this page), serial, sequence, CRC, lacing table;
  *  - the CRC is the Ogg-specific CRC-32 (poly 0x04c11db7, forward,
  *    zero init, zero final XOR, computed with the CRC field zeroed)
  *    — VERIFIED on every page, not skipped;
  *  - packet lacing: a packet is a run of 255-valued lacing segments
  *    closed by one < 255 (possibly 0), so packet count = lacing
  *    values < 255; a packet whose run never closes CONTINUES on the
  *    next page (continuation flag there);
  *  - multiplexed streams: serials tracked; channels/rate from the
  *    FIRST BOS Vorbis id header (the q173 first-track-wins rule);
  *  - duration = max granule (PCM sample position for Vorbis) scaled
  *    by the id header's rate, integer floor.
  */
object Ogg {

  final case class OggInfo(
      nPages: Int, nPackets: Long, nStreams: Int, channels: Int,
      sampleRate: Long, granuleMax: Long, durationMs: Long, valid: Boolean)

  private val Invalid = OggInfo(0, 0L, 0, 0, 0L, 0L, 0L, valid = false)

  /** Ogg CRC-32: polynomial 0x04c11db7, MSB-first (no reflection),
    * initial value 0, no final XOR (RFC 3533 §6).
    */
  private val crcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var j = 0
    while (j < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      j += 1
    }
    r
  }

  def crc32(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (data(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  // ---- writer (fixture synthesis; spec cross-checks the reader) ----

  /** Knobs for one synthesized single-stream Vorbis-in-Ogg file:
    * `pagePackets(i)` = whole-packet sizes on audio page i (size 0
    * legal — a zero-length packet laces as one 0 segment);
    * `granuleStep` = PCM samples per audio page; `spanTail` adds one
    * 300-byte packet that STARTS on audio page 0 and ENDS on audio
    * page 1 (lacing 255 left open, continuation flag + remainder 45
    * on the next page) — requires ≥ 2 audio pages.
    */
  final case class OggParams(
      channels: Int, sampleRate: Int, pagePackets: Seq[Seq[Int]],
      granuleStep: Long, spanTail: Boolean, seed: Long = 0L)

  private def le16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
  }
  private def le32(out: ArrayBuffer[Byte], v: Int): Unit = {
    le16(out, v & 0xffff); le16(out, (v >>> 16) & 0xffff)
  }
  private def le64(out: ArrayBuffer[Byte], v: Long): Unit = {
    le32(out, (v & 0xffffffffL).toInt); le32(out, (v >>> 32).toInt)
  }

  /** Vorbis identification header packet (30 bytes). */
  private def idHeader(p: OggParams): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out += 0x01.toByte
    out ++= "vorbis".getBytes("US-ASCII")
    le32(out, 0) // vorbis_version
    out += p.channels.toByte
    le32(out, p.sampleRate)
    le32(out, 0); le32(out, 44100); le32(out, 0) // bitrate max/nominal/min
    out += 0xb8.toByte // blocksize_0 = 256, blocksize_1 = 2048
    out += 0x01.toByte // framing bit
    out.toArray
  }

  /** One page: header + lacing + payload, CRC patched in. `lacings`
    * must already encode the packet layout (each value ≤ 255).
    */
  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
                   lacings: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    require(lacings.forall(l => l >= 0 && l <= 255), s"bad lacing: $lacings")
    require(lacings.sum == payload.length, "lacing/payload mismatch")
    require(lacings.size <= 255, "a page carries at most 255 lacing values")
    val out = ArrayBuffer.empty[Byte]
    out ++= "OggS".getBytes("US-ASCII")
    out += 0 // version
    out += headerType.toByte
    le64(out, granule)
    le32(out, serial)
    le32(out, seq)
    le32(out, 0) // CRC placeholder
    out += lacings.size.toByte
    lacings.foreach(l => out += l.toByte)
    out ++= payload
    val bytes = out.toArray
    val c = crc32(bytes, 0, bytes.length)
    bytes(22) = (c & 0xff).toByte
    bytes(23) = ((c >> 8) & 0xff).toByte
    bytes(24) = ((c >> 16) & 0xff).toByte
    bytes(25) = ((c >>> 24) & 0xff).toByte
    bytes
  }

  private def fill(n: Int, seed: Long, off: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((seed * 31 + (off + i) * 7 + 13) & 0xff).toByte)

  /** Lacing for one whole packet of `size` bytes: ⌊size/255⌋ full
    * segments then the remainder (0 included — a 255-multiple packet
    * needs its closing 0).
    */
  private def packetLacing(size: Int): Seq[Int] =
    Seq.fill(size / 255)(255) :+ (size % 255)

  def encode(p: OggParams, serial: Int = 0x5eed): Array[Byte] = {
    require(p.pagePackets.nonEmpty, "need at least one audio page")
    require(!p.spanTail || p.pagePackets.size >= 2, "spanTail needs >= 2 audio pages")
    val out = ArrayBuffer.empty[Byte]
    val id = idHeader(p)
    out ++= page(0x02, 0L, serial, 0, packetLacing(id.length), id)
    var off = 0
    val nAudio = p.pagePackets.size
    p.pagePackets.zipWithIndex.foreach { case (sizes, i) =>
      val lac = ArrayBuffer.empty[Int]
      val pay = ArrayBuffer.empty[Byte]
      var headerType = 0
      if (p.spanTail && i == 1) {
        // the 45-byte remainder of the spanning packet ends here
        headerType |= 0x01
        lac += 45
        pay ++= fill(45, p.seed, off); off += 45
      }
      sizes.foreach { s =>
        lac ++= packetLacing(s)
        pay ++= fill(s, p.seed, off); off += s
      }
      if (p.spanTail && i == 0) {
        // 255 bytes of the 300-byte spanning packet: lacing run left
        // open (no closing < 255), so the packet continues next page
        lac += 255
        pay ++= fill(255, p.seed, off); off += 255
      }
      if (i == nAudio - 1) headerType |= 0x04 // EOS
      out ++= page(headerType, (i + 1L) * p.granuleStep, serial, i + 1,
        lac.toSeq, pay.toArray)
    }
    out.toArray
  }

  // ---- reader ----

  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def rdLe64(b: Array[Byte], o: Int): Long =
    (rdLe32(b, o) & 0xffffffffL) | (rdLe32(b, o + 4).toLong << 32)

  /** Walk every page of `bytes`: CRC-verified page structure, packet
    * lacing, stream serials, first-BOS Vorbis id header, max granule
    * and the integer-floor duration. Invalid (wrong magic/version,
    * CRC mismatch, truncation, missing/malformed id header) → the
    * all-zero invalid row, never a throw.
    */
  def decode(bytes: Array[Byte]): OggInfo = {
    var pos = 0
    var nPages = 0
    var nPackets = 0L
    var granuleMax = 0L
    var channels = 0
    var rate = 0L
    var sawId = false
    var lastHeaderType = 0
    val serials = scala.collection.mutable.Set.empty[Int]
    while (pos < bytes.length) {
      if (pos + 27 > bytes.length) return Invalid
      if (bytes(pos) != 'O' || bytes(pos + 1) != 'g' || bytes(pos + 2) != 'g' ||
        bytes(pos + 3) != 'S') return Invalid
      if (bytes(pos + 4) != 0) return Invalid // stream_structure_version
      val headerType = bytes(pos + 5) & 0xff
      val granule = rdLe64(bytes, pos + 6)
      val serial = rdLe32(bytes, pos + 14)
      val crcStored = rdLe32(bytes, pos + 22)
      val nsegs = bytes(pos + 26) & 0xff
      if (pos + 27 + nsegs > bytes.length) return Invalid
      var paylen = 0
      var si = 0
      while (si < nsegs) {
        val l = bytes(pos + 27 + si) & 0xff
        paylen += l
        if (l < 255) nPackets += 1
        si += 1
      }
      val pageLen = 27 + nsegs + paylen
      if (pos + pageLen > bytes.length) return Invalid
      // CRC over the page with the CRC field zeroed
      var crc = 0
      var i = pos
      while (i < pos + pageLen) {
        val b = if (i >= pos + 22 && i < pos + 26) 0 else bytes(i) & 0xff
        crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ b) & 0xff)
        i += 1
      }
      if (crc != crcStored) return Invalid
      serials += serial
      if (granule != -1L && granule > granuleMax) granuleMax = granule
      if ((headerType & 0x02) != 0 && !sawId) {
        // first BOS page: expect the Vorbis identification header
        val o = pos + 27 + nsegs
        if (paylen >= 30 && bytes(o) == 0x01 &&
          bytes(o + 1) == 'v' && bytes(o + 2) == 'o' && bytes(o + 3) == 'r' &&
          bytes(o + 4) == 'b' && bytes(o + 5) == 'i' && bytes(o + 6) == 's' &&
          rdLe32(bytes, o + 7) == 0 && (bytes(o + 29) & 0x01) == 1) {
          channels = bytes(o + 11) & 0xff
          rate = rdLe32(bytes, o + 12) & 0xffffffffL
          sawId = true
        }
      }
      nPages += 1
      lastHeaderType = headerType
      pos += pageLen
    }
    // a stream cut mid-transfer ends without its EOS page — a page-
    // boundary truncation is structurally parseable, so completeness
    // needs the flag: the file's final page must carry EOS (0x04)
    if (nPages == 0 || !sawId || rate == 0L || (lastHeaderType & 0x04) == 0) Invalid
    else OggInfo(nPages, nPackets, serials.size, channels, rate, granuleMax,
      granuleMax * 1000L / rate, valid = true)
  }
}
