package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GIF decoder — the last non-lossy image format moved into
  * the REAL-decode tier next to [[Bmp]], [[Png]] and [[Wav]], with
  * zero native dependencies: the GIF87a/89a container (logical screen
  * descriptor, color tables, extension/image block walk) and the LZW
  * variable-code-width stream are fully specified public formats.
  * After this, the genuinely-native stubs are only lossy codecs
  * (JPEG pixels, MP3/AAC) and OCR.
  *
  * Scope: first image frame, interlaced or not (interlace permutes
  * scanline order only, and channel sums/peak are row-order-
  * invariant — the JDK writer interlaces by default), global or
  * local color table. Encode-with-ImageIO / decode-by-hand
  * round-trips, and GifSpec cross-checks this decoder against the
  * JDK's GIF READER on the same bytes.
  *
  * Decode folds palette-mapped pixels into EXACT integer statistics
  * (per-channel sums, peak) — engine-portable, so the q83 oracle
  * rebuilds them bit-for-bit from the synthesis arithmetic without
  * ever seeing a GIF byte. Graphic-control extensions (transparency,
  * animation timing) are skipped: stats cover the stored palette
  * colors of frame 1.
  */
object Gif {

  /** `valid=false` rows carry zeros (crawl-scale contract: malformed
    * payloads yield a row, never an exception).
    */
  final case class GifInfo(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val Invalid = GifInfo(0, 0, 0L, 0L, 0L, 0, valid = false)

  /** Parse a GIF payload into exact integer pixel statistics. */
  def decode(bytes: Array[Byte]): GifInfo = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => Invalid }
  }

  private def decodeOrThrow(bytes: Array[Byte]): GifInfo = {
    if (bytes == null || bytes.length < 13) return Invalid
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return Invalid
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(6)
    // logical screen descriptor
    buf.getShort; buf.getShort // screen dims (the frame carries its own)
    val packed = buf.get() & 0xff
    buf.get() // background color index
    buf.get() // pixel aspect ratio
    val globalTable =
      if ((packed & 0x80) != 0) readColorTable(buf, 2 << (packed & 0x07)) else null

    // block walk to the first image descriptor
    while (buf.remaining() >= 1) {
      (buf.get() & 0xff) match {
        case 0x21 => // extension: label + sub-blocks, all skipped
          if (buf.remaining() < 1) return Invalid
          buf.get()
          skipSubBlocks(buf)
        case 0x2c => // image descriptor — decode this frame and stop
          if (buf.remaining() < 9) return Invalid
          buf.getShort; buf.getShort // left, top (stats don't place the frame)
          val w = buf.getShort & 0xffff
          val h = buf.getShort & 0xffff
          val ipacked = buf.get() & 0xff
          if (w <= 0 || h <= 0) return Invalid
          // interlace (bit 6) is ACCEPTED: it permutes scanline order
          // only, and per-channel sums/peak are row-order-invariant —
          // the JDK's own GIF writer emits interlaced frames by default
          if (w.toLong * h > 64L * 1024 * 1024) return Invalid
          val table =
            if ((ipacked & 0x80) != 0) readColorTable(buf, 2 << (ipacked & 0x07))
            else globalTable
          if (table == null) return Invalid
          if (buf.remaining() < 1) return Invalid
          val minCodeSize = buf.get() & 0xff
          if (minCodeSize < 2 || minCodeSize > 11) return Invalid
          val data = concatSubBlocks(buf)
          if (data == null) return Invalid
          val indices = lzwDecode(minCodeSize, data, w * h)
          if (indices == null) return Invalid
          var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
          var i = 0
          while (i < indices.length) {
            val idx = indices(i) & 0xff
            if (idx >= table.length / 3) return Invalid
            val r = table(idx * 3) & 0xff
            val g = table(idx * 3 + 1) & 0xff
            val b = table(idx * 3 + 2) & 0xff
            sumR += r; sumG += g; sumB += b
            val m = math.max(r, math.max(g, b))
            if (m > peak) peak = m
            i += 1
          }
          return GifInfo(w, h, sumR, sumG, sumB, peak, valid = true)
        case 0x3b => return Invalid // trailer before any image
        case _ => return Invalid
      }
    }
    Invalid
  }

  private def readColorTable(buf: ByteBuffer, entries: Int): Array[Byte] = {
    val t = new Array[Byte](entries * 3)
    buf.get(t)
    t
  }

  private def skipSubBlocks(buf: ByteBuffer): Unit = {
    var len = buf.get() & 0xff
    while (len != 0) {
      buf.position(buf.position() + len)
      len = buf.get() & 0xff
    }
  }

  private def concatSubBlocks(buf: ByteBuffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var len = buf.get() & 0xff
    while (len != 0) {
      if (buf.remaining() < len + 1) return null
      val chunk = new Array[Byte](len)
      buf.get(chunk)
      out.write(chunk)
      len = buf.get() & 0xff
    }
    out.toByteArray
  }

  /** GIF-flavor LZW: variable code width starting at minCodeSize+1,
    * growing when the dictionary fills the current width (cap 12
    * bits), LSB-first bit packing, clear/EOI control codes. Returns
    * exactly `expected` indices, or null on any malformed stream.
    * Dictionary entries are (prefix code, appended byte) pairs; a
    * chain is acyclic because every prefix is a previously assigned
    * code, so expansion terminates.
    */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte], expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outLen = 0
    var dictSize = eoi + 1
    var codeSize = minCodeSize + 1
    var bitPos = 0
    val nBits = data.length * 8
    var prev = -1

    def firstByte(code: Int): Byte = {
      var c = code
      while (c > eoi) c = prefix(c)
      c.toByte
    }

    while (outLen < expected) {
      if (bitPos + codeSize > nBits) return null // truncated stream
      var code = 0
      var i = 0
      while (i < codeSize) {
        code |= ((data((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1) << i
        i += 1
      }
      bitPos += codeSize
      if (code == eoi) return null // early EOI: fewer pixels than declared
      else if (code == clear) {
        dictSize = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else {
        var sp = 0
        var c = code
        if (c >= dictSize) {
          // KwKwK: only the next unassigned code is legal
          if (prev < 0 || c != dictSize) return null
          stack(sp) = firstByte(prev); sp += 1; c = prev
        }
        while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return null
        stack(sp) = c.toByte; sp += 1
        if (outLen + sp > expected) return null
        var j = sp - 1
        while (j >= 0) { out(outLen) = stack(j); outLen += 1; j -= 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = stack(sp - 1) // first byte of this expansion
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  /** Animated-GIF statistics over SAMPLED frames (r14b): GIF is the
    * web's third video container in practice — the q169 frame-
    * sampling contract applies (decode every `step`-th frame, never
    * all). `durationMs` sums every frame's graphic-control delay
    * (centiseconds × 10) whether sampled or not; stats cover each
    * sampled frame's OWN stored pixels (no inter-frame compositing —
    * the curation signals are per-frame, and disposal compositing
    * would couple a frame's stats to its predecessors').
    */
  final case class GifAnimInfo(
      width: Int, height: Int, nFrames: Int, nSampled: Int,
      durationMs: Long, sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val InvalidAnim =
    GifAnimInfo(0, 0, 0, 0, 0L, 0L, 0L, 0L, 0, valid = false)

  /** Walk every frame; decode frames 0, step, 2·step, …; malformed →
    * invalid row, never a throw.
    */
  def decodeFrames(bytes: Array[Byte], step: Int = 1): GifAnimInfo = {
    require(step > 0, s"bad sampling step: $step")
    try decodeFramesOrThrow(bytes, step)
    catch { case _: Exception => InvalidAnim }
  }

  private def decodeFramesOrThrow(bytes: Array[Byte], step: Int): GifAnimInfo = {
    if (bytes == null || bytes.length < 13) return InvalidAnim
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return InvalidAnim
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(6)
    val screenW = buf.getShort & 0xffff
    val screenH = buf.getShort & 0xffff
    val packed = buf.get() & 0xff
    buf.get(); buf.get() // background index, aspect ratio
    val globalTable =
      if ((packed & 0x80) != 0) readColorTable(buf, 2 << (packed & 0x07)) else null

    var nFrames = 0; var nSampled = 0
    var durationCs = 0L
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
    while (buf.remaining() >= 1) {
      (buf.get() & 0xff) match {
        case 0x21 =>
          if (buf.remaining() < 1) return InvalidAnim
          val label = buf.get() & 0xff
          if (label == 0xf9) { // graphic control: read the delay field
            val blockLen = buf.get() & 0xff
            if (blockLen < 4 || buf.remaining() < blockLen + 1) return InvalidAnim
            buf.get() // packed (disposal/transparency — stats don't composite)
            durationCs += buf.getShort & 0xffff
            buf.position(buf.position() + (blockLen - 3))
            if ((buf.get() & 0xff) != 0) return InvalidAnim // terminator
          } else skipSubBlocks(buf)
        case 0x2c =>
          if (buf.remaining() < 9) return InvalidAnim
          buf.getShort; buf.getShort // left, top
          val w = buf.getShort & 0xffff
          val h = buf.getShort & 0xffff
          val ipacked = buf.get() & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return InvalidAnim
          val table =
            if ((ipacked & 0x80) != 0) readColorTable(buf, 2 << (ipacked & 0x07))
            else globalTable
          if (table == null) return InvalidAnim
          if (buf.remaining() < 1) return InvalidAnim
          val minCodeSize = buf.get() & 0xff
          if (minCodeSize < 2 || minCodeSize > 11) return InvalidAnim
          if (nFrames % step == 0) {
            val data = concatSubBlocks(buf)
            if (data == null) return InvalidAnim
            val indices = lzwDecode(minCodeSize, data, w * h)
            if (indices == null) return InvalidAnim
            var i = 0
            while (i < indices.length) {
              val idx = indices(i) & 0xff
              if (idx >= table.length / 3) return InvalidAnim
              val r = table(idx * 3) & 0xff
              val g = table(idx * 3 + 1) & 0xff
              val b = table(idx * 3 + 2) & 0xff
              sumR += r; sumG += g; sumB += b
              val m = math.max(r, math.max(g, b))
              if (m > peak) peak = m
              i += 1
            }
            nSampled += 1
          } else skipSubBlocks(buf) // unsampled frame: skip its LZW data
          nFrames += 1
        case 0x3b =>
          if (nFrames == 0) return InvalidAnim
          return GifAnimInfo(screenW, screenH, nFrames, nSampled,
            durationCs * 10L, sumR, sumG, sumB, peak, valid = true)
        case _ => return InvalidAnim
      }
    }
    InvalidAnim // no trailer
  }

  /** Hand-rolled multi-frame GIF89a writer: global color table, one
    * graphic-control extension (delay, centiseconds) per frame, every
    * frame full-screen, LZW as an all-literals stream that mirrors
    * the decoder's dictionary evolution (a CLEAR before the table
    * would overflow) — conformant output any GIF reader accepts
    * (GifSpec cross-checks the JDK reader frame-for-frame).
    */
  def encodeAnimated(width: Int, height: Int, palette: Array[Int],
                     frames: Seq[Array[Byte]], delaysCs: Seq[Int]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(frames.size == delaysCs.size, "one delay per frame")
    require(palette.nonEmpty && palette.length <= 256, "palette must be 1..256 entries")
    frames.foreach(f => require(f.length == width * height, "frame must be w*h indices"))
    // global color table size: next power of two >= palette length, min 2
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val gctSize = 1 << gctBits
    val minCodeSize = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(width); u16(height)
    u8(0x80 | (gctBits - 1)) // GCT present, size 2^gctBits
    u8(0); u8(0)
    (0 until gctSize).foreach { k =>
      val c = if (k < palette.length) palette(k) else 0
      u8((c >> 16) & 0xff); u8((c >> 8) & 0xff); u8(c & 0xff)
    }
    frames.zip(delaysCs).foreach { case (indices, delay) =>
      u8(0x21); u8(0xf9); u8(4) // graphic control extension
      u8(0); u16(delay); u8(0); u8(0) // no disposal, no transparency
      u8(0x2c); u16(0); u16(0); u16(width); u16(height); u8(0) // descriptor
      u8(minCodeSize)
      val lzw = lzwLiteralEncode(minCodeSize, indices)
      var off = 0
      while (off < lzw.length) { // 255-byte sub-blocks
        val n = math.min(255, lzw.length - off)
        u8(n); out.write(lzw, off, n)
        off += n
      }
      u8(0) // block terminator
    }
    u8(0x3b)
    out.toByteArray
  }

  /** All-literals GIF LZW: each pixel emitted as its own root code,
    * tracking the decoder's dictionary growth (an entry per emitted
    * code after the first, width bump when the table fills the
    * current width) and clearing before the 4096-entry cap.
    */
  private def lzwLiteralEncode(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var curBits = 0
    var codeSize = minCodeSize + 1
    var dictSize = eoi + 1
    var prev = -1
    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += codeSize
      while (curBits >= 8) { out.write(cur & 0xff); cur >>= 8; curBits -= 8 }
    }
    put(clear)
    var i = 0
    while (i < indices.length) {
      put(indices(i) & 0xff)
      if (prev >= 0 && dictSize < 4096) {
        dictSize += 1
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      prev = indices(i) & 0xff
      if (dictSize >= 4095) {
        put(clear)
        dictSize = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      }
      i += 1
    }
    put(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** Encode an indexed image as GIF via the JDK's own ImageIO writer
    * (the decode side above is the hand-rolled half of the
    * round-trip). `palette` entries are 0xRRGGBB; indices must be
    * < palette.length. Indexed-in/indexed-out is lossless, so the
    * per-pixel colors — and therefore the integer statistics — are
    * exactly the synthesis arithmetic's.
    */
  def encodeViaImageIO(width: Int, height: Int, indices: Array[Byte],
                       palette: Array[Int]): Array[Byte] = {
    require(indices.length == width * height, "indices must be w*h bytes")
    require(palette.nonEmpty && palette.length <= 256, "palette must be 1..256 entries")
    val r = palette.map(c => ((c >> 16) & 0xff).toByte)
    val g = palette.map(c => ((c >> 8) & 0xff).toByte)
    val b = palette.map(c => (c & 0xff).toByte)
    val icm = new java.awt.image.IndexColorModel(8, palette.length, r, g, b)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setDataElements(0, 0, width, height, indices)
    // r17 (guide §4.5 applied JVM-side): `ImageIO.write(img, "gif", out)`
    // per row paid a writer-REGISTRY SCAN plus a DISK-backed stream
    // cache file per image. Same JDK encoder, same bytes — but the
    // writer is constructed once per thread and the output stream is
    // memory-backed.
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val w = gifWriter.get()
    w.setOutput(ios)
    w.write(img)
    ios.flush()
    w.setOutput(null)
    out.toByteArray
  }

  /** One JDK GIF writer per thread — ImageWriter is not thread-safe,
    * and executor tasks run on a fixed pool, so a ThreadLocal amortises
    * the per-image registry lookup + instantiation across a partition.
    */
  private val gifWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      require(it.hasNext, "JDK GIF writer missing")
      it.next()
    }
  }
}
