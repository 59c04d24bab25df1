package graft.multimodal

/** XZ container + LZMA2 layer (tukaani's public xz-file-format spec
  * + the LZMA SDK specification) in pure JVM — completing the
  * corpus-compression family next to gzip, LZ4, Zstandard and bzip2:
  * many dataset and Wikipedia mirrors ship `.xz`. The decoder walks
  * the whole container: stream header/footer with CRC32-protected
  * flags and the backward-size link, block headers (VLI sizes,
  * filter chain — LZMA2 only, delta/BCJ rejected cleanly), LZMA2
  * chunk control bytes (uncompressed chunks, state/props/dict-reset
  * modes) driving the full adaptive-range-coded [[Lzma]] core, block
  * padding, the per-block CHECK over uncompressed data (None, CRC32,
  * CRC64 — our own reflected-ECMA CRC64 table — all VERIFIED), the
  * index (record count + unpadded/uncompressed VLI pairs, VERIFIED
  * against the blocks actually decoded), and the index CRC. The
  * encoder emits valid XZ with CRC64 checks and UNCOMPRESSED LZMA2
  * chunks — the spec's own escape hatch for incompressible data —
  * so reference decoders accept its output byte-for-byte; real
  * compressed streams reach our decoder through the XzSpec
  * cross-check (xz-java across presets 0–9, which exercises every
  * LZMA packet family). Malformed input throws; callers map to
  * valid=false.
  */
object Xz {

  private val HeaderMagic = Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0)

  // ---------------------------------------------------------------- crc64

  private val Crc64Table: Array[Long] = {
    val poly = 0xc96c5795d7870f42L // ECMA-182, reflected
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def crc64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var c = ~0L
    var i = off
    while (i < off + len) {
      c = Crc64Table(((c ^ bytes(i)) & 0xff).toInt) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  // ---------------------------------------------------------------- read

  final case class XzInfo(data: Array[Byte], nBlocks: Long, nChunks: Long,
                          checkType: Int, checksVerified: Boolean)

  def decompress(bytes: Array[Byte]): XzInfo = {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "xz: truncated")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u32le(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def vli(): Long = {
      var v = 0L
      var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        require(shift < 56, "xz: vli too long")
        v |= (b & 0x7fL) << shift
        shift += 7
        b = u8()
      }
      require(b != 0 || shift == 0, "xz: non-minimal vli")
      v | ((b & 0x7fL) << shift)
    }
    // ---- stream header
    HeaderMagic.foreach(m => require(u8() == (m & 0xff), "xz: bad magic"))
    val flagsOff = pos
    require(u8() == 0, "xz: bad stream flags")
    val checkType = u8()
    require(Set(0x00, 0x01, 0x04, 0x0a)(checkType), "xz: unsupported check type")
    require(u32le() == crc32(bytes, flagsOff, 2), "xz: stream header CRC mismatch")
    // ---- blocks until the index indicator
    val out = new Lzma.Dict(1 << 16)
    val records = Vector.newBuilder[(Long, Long)] // (unpadded size, uncompressed size)
    var nBlocks = 0L
    var nChunks = 0L
    var atIndex = false
    while (!atIndex) {
      require(pos < bytes.length, "xz: missing index")
      if ((bytes(pos) & 0xff) == 0) { pos += 1; atIndex = true }
      else {
        val blockStart = pos
        val headerSizeByte = u8()
        val headerSize = (headerSizeByte + 1) * 4
        val headerEnd = blockStart + headerSize
        require(headerEnd <= bytes.length, "xz: truncated block header")
        val blockFlags = u8()
        val nFilters = (blockFlags & 3) + 1
        require((blockFlags & 0x3c) == 0, "xz: reserved block flag bits")
        val hasCompSize = (blockFlags & 0x40) != 0
        val hasUncompSize = (blockFlags & 0x80) != 0
        val declaredComp = if (hasCompSize) vli() else -1L
        val declaredUncomp = if (hasUncompSize) vli() else -1L
        require(nFilters == 1, "xz: filter chains beyond LZMA2 not supported")
        val filterId = vli()
        require(filterId == 0x21, "xz: non-LZMA2 filter not supported")
        val propsSize = vli()
        require(propsSize == 1, "xz: bad LZMA2 properties size")
        val dictCode = u8()
        require(dictCode <= 40, "xz: bad LZMA2 dictionary size")
        while (pos < headerEnd - 4) { require(u8() == 0, "xz: nonzero header padding") }
        require(u32le() == crc32(bytes, blockStart, headerSize - 4),
          "xz: block header CRC mismatch")
        // ---- LZMA2 chunks
        val blockOutStart = out.pos
        val dataStart = pos
        val lzma = new Lzma(out)
        var propsSeen = false
        var ended = false
        val maxTotal = 1 << 28 // 256 MB in-memory decode bound
        while (!ended) {
          require(out.pos <= maxTotal, "xz: output too large")
          val control = u8()
          if (control == 0x00) ended = true
          else if (control == 0x01 || control == 0x02) {
            // uncompressed chunk; 0x01 also resets the dictionary
            val size = ((u8() << 8) | u8()) + 1
            require(pos + size <= bytes.length, "xz: truncated uncompressed chunk")
            out.write(bytes, pos, size)
            pos += size
            nChunks += 1
          } else {
            require(control >= 0x80, "xz: bad chunk control byte")
            val uncompSize = (((control & 0x1f) << 16) | (u8() << 8) | u8()) + 1
            val compSize = ((u8() << 8) | u8()) + 1
            val resetMode = (control >> 5) & 3
            if (resetMode >= 2) {
              lzma.setProps(u8())
              propsSeen = true
            } else {
              require(propsSeen, "xz: chunk needs props before first reset")
              if (resetMode == 1) lzma.resetState()
            }
            require(pos + compSize <= bytes.length, "xz: truncated chunk")
            lzma.decodeChunk(bytes, pos, compSize, uncompSize)
            pos += compSize
            nChunks += 1
          }
        }
        val blockUncomp = (out.pos - blockOutStart).toLong
        val compressedSize = (pos - dataStart).toLong
        if (declaredComp >= 0) require(compressedSize == declaredComp, "xz: compressed size mismatch")
        if (declaredUncomp >= 0) require(blockUncomp == declaredUncomp, "xz: uncompressed size mismatch")
        // block padding to a multiple of 4 (counted from the block start)
        while (((pos - blockStart) & 3) != 0) require(u8() == 0, "xz: nonzero block padding")
        // check over the uncompressed block data
        checkType match {
          case 0x00 => ()
          case 0x01 =>
            require(u32le() == crc32(out.buf, blockOutStart, blockUncomp.toInt),
              "xz: block CRC32 mismatch")
          case 0x04 =>
            var stored = 0L
            var i = 0
            while (i < 8) { stored |= (u8().toLong) << (8 * i); i += 1 }
            require(stored == crc64(out.buf, blockOutStart, blockUncomp.toInt),
              "xz: block CRC64 mismatch")
          case _ => // SHA-256
            val md = java.security.MessageDigest.getInstance("SHA-256")
            md.update(out.buf, blockOutStart, blockUncomp.toInt)
            val want = md.digest()
            val got = new Array[Byte](32)
            var i = 0
            while (i < 32) { got(i) = u8().toByte; i += 1 }
            require(java.util.Arrays.equals(want, got), "xz: block SHA-256 mismatch")
        }
        val checkLen = checkType match {
          case 0x00 => 0; case 0x01 => 4; case 0x04 => 8; case _ => 32
        }
        val unpadded = headerSize.toLong + compressedSize + checkLen
        records += ((unpadded, blockUncomp))
        nBlocks += 1
      }
    }
    // ---- index (the 0x00 indicator is already consumed)
    val indexStart = pos - 1
    val recs = records.result()
    val count = vli()
    require(count == recs.size.toLong, "xz: index record count mismatch")
    recs.foreach { case (unpadded, uncomp) =>
      require(vli() == unpadded, "xz: index unpadded size mismatch")
      require(vli() == uncomp, "xz: index uncompressed size mismatch")
    }
    while (((pos - indexStart) & 3) != 0) require(u8() == 0, "xz: nonzero index padding")
    require(u32le() == crc32(bytes, indexStart, pos - 4 - indexStart),
      "xz: index CRC mismatch")
    val indexSize = pos - indexStart
    // ---- stream footer
    val footerCrc = u32le()
    val footerBodyOff = pos
    val backwardSize = u32le()
    require((backwardSize + 1) * 4 == indexSize, "xz: backward size mismatch")
    require(u8() == 0 && u8() == checkType, "xz: footer flags mismatch")
    require(footerCrc == crc32(bytes, footerBodyOff, 6), "xz: footer CRC mismatch")
    require(u8() == 'Y' && u8() == 'Z', "xz: bad footer magic")
    require(pos == bytes.length, "xz: trailing bytes")
    XzInfo(out.result, nBlocks, nChunks, checkType, checkType != 0)
  }

  // ---------------------------------------------------------------- write

  /** Encode an XZ stream with CRC64 checks: one block of uncompressed
    * LZMA2 chunks (the spec's escape hatch for incompressible data;
    * compression here is the container's job elsewhere — this writer
    * exists so the CONTAINER walk has a reference-accepted twin).
    */
  def compress(in: Array[Byte], chunkSize: Int = 1 << 16): Array[Byte] = {
    require(chunkSize >= 1 && chunkSize <= (1 << 16), "xz: bad chunk size")
    val out = new java.io.ByteArrayOutputStream(in.length + 128)
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write(HeaderMagic)
    val checkType = 0x04 // CRC64, xz's default
    out.write(0); out.write(checkType)
    u32le(crc32(Array[Byte](0, checkType.toByte), 0, 2))
    // ---- one block: header (flags + LZMA2 filter with 64 MiB dict)
    val header = new java.io.ByteArrayOutputStream()
    header.write(0) // one filter, no size fields
    header.write(0x21) // LZMA2
    header.write(1) // props size
    header.write(26) // dict size code: 64 MiB
    val rawLen = 1 + header.size()
    val headerSize = ((rawLen + 4 + 3) / 4) * 4
    out.write(headerSize / 4 - 1)
    val hb = header.toByteArray
    out.write(hb)
    var pad = headerSize - 4 - rawLen
    while (pad > 0) { out.write(0); pad -= 1 }
    // header CRC over everything so far in the header
    val headerBytes = new Array[Byte](headerSize - 4)
    headerBytes(0) = (headerSize / 4 - 1).toByte
    System.arraycopy(hb, 0, headerBytes, 1, hb.length)
    u32le(crc32(headerBytes, 0, headerBytes.length))
    // ---- LZMA2 uncompressed chunks (0x01 resets dict, then 0x02)
    var pos0 = 0
    var compressedSize = 0L
    var first = true
    while (pos0 < in.length) {
      val n = math.min(chunkSize, in.length - pos0)
      out.write(if (first) 0x01 else 0x02)
      out.write(((n - 1) >> 8) & 0xff); out.write((n - 1) & 0xff)
      out.write(in, pos0, n)
      compressedSize += 3 + n
      pos0 += n
      first = false
    }
    out.write(0x00) // end of LZMA2
    compressedSize += 1
    while ((compressedSize & 3) != 0) { out.write(0); compressedSize += 1 } // block padding
    val h = crc64(in, 0, in.length)
    var i = 0
    var hv = h
    while (i < 8) { out.write((hv & 0xff).toInt); hv >>>= 8; i += 1 }
    // ---- index
    val unpaddedRaw = {
      // compressed size WITHOUT the block padding
      var cs = 1L // end marker
      var p = 0
      while (p < in.length) { cs += 3 + math.min(chunkSize, in.length - p); p = p + math.min(chunkSize, in.length - p) }
      headerSize.toLong + cs + 8
    }
    val index = new java.io.ByteArrayOutputStream()
    index.write(0) // indicator
    def vliTo(o: java.io.ByteArrayOutputStream, value: Long): Unit = {
      var v = value
      while (v >= 0x80) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    vliTo(index, 1L)
    vliTo(index, unpaddedRaw)
    vliTo(index, in.length.toLong)
    while ((index.size & 3) != 0) index.write(0)
    val ib = index.toByteArray
    out.write(ib)
    u32le(crc32(ib, 0, ib.length))
    val indexSize = ib.length + 4
    // ---- footer
    val footerBody = new Array[Byte](6)
    val bw = indexSize / 4 - 1
    footerBody(0) = (bw & 0xff).toByte; footerBody(1) = ((bw >> 8) & 0xff).toByte
    footerBody(2) = ((bw >> 16) & 0xff).toByte; footerBody(3) = ((bw >> 24) & 0xff).toByte
    footerBody(4) = 0; footerBody(5) = checkType.toByte
    u32le(crc32(footerBody, 0, 6))
    out.write(footerBody)
    out.write('Y'); out.write('Z')
    out.toByteArray
  }
}
