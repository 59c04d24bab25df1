package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal PNG truecolor decoder — REAL compressed-image PIXEL decode
  * with zero native dependencies: the PNG container (chunk walk),
  * DEFLATE stream (JDK `java.util.zip.Inflater`), all five scanline
  * filter reconstructions (None/Sub/Up/Average/Paeth), and BOTH
  * interlace methods — sequential and Adam7 (r14b: seven passes, each
  * an independent filtered sub-image whose filters reference
  * neighbors WITHIN the pass, de-interleaved into the raster by the
  * spec's offset/stride table) — all fully specified public formats.
  *
  * Scope: 8-bit-depth, colour type 2 (truecolor RGB), interlace 0 or
  * 1 — what the JDK's own ImageIO PNG writer emits for opaque RGB
  * images in both its default and progressive modes, so
  * encode-with-ImageIO / decode-by-hand round-trips BOTH ways
  * (PngSpec cross-checks them). Other colour types return invalid
  * and stay on the ImageIO tier.
  *
  * Decode folds reconstructed pixels into EXACT integer statistics
  * (per-channel sums, peak) — engine-portable, so the q80 oracle
  * rebuilds them bit-for-bit from the synthesis arithmetic without
  * ever seeing a PNG byte. [[decodePixels]] exposes the assembled
  * raster for placement-sensitive consumers (resize, perceptual
  * hashing, the q178 position-weighted checksum that certifies the
  * de-interlace permutation — channel sums alone are
  * permutation-blind).
  */
object Png {

  /** `valid=false` rows carry zeros (crawl-scale contract: malformed
    * payloads yield a row, never an exception).
    */
  final case class PngInfo(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val Invalid = PngInfo(0, 0, 0L, 0L, 0L, 0, valid = false)

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Adam7 pass table: (x0, y0, dx, dy). */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Parse a PNG payload into exact integer pixel statistics. */
  def decode(bytes: Array[Byte]): PngInfo = {
    decodePixels(bytes) match {
      case None => Invalid
      case Some((width, height, rgb)) =>
        var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
        var i = 0
        while (i < rgb.length) {
          val ch = rgb(i) & 0xff
          (i % 3) match {
            case 0 => sumR += ch
            case 1 => sumG += ch
            case _ => sumB += ch
          }
          if (ch > peak) peak = ch
          i += 1
        }
        PngInfo(width, height, sumR, sumG, sumB, peak, valid = true)
    }
  }

  /** Full top-down row-major RGB raster, or None for anything outside
    * the supported scope / malformed. Never throws.
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodePixelsOrThrow(bytes)
    catch { case _: Exception => None }
  }

  private def decodePixelsOrThrow(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(8)
    var width = 0; var height = 0
    var interlaced = false
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt
      if (len < 0 || len > buf.remaining() - 8) return None
      val ctype = new String(Array(buf.get(), buf.get(), buf.get(), buf.get())
        .map(b => (b & 0xff).toChar))
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = buf.getInt; height = buf.getInt
          val bitDepth = buf.get() & 0xff
          val colourType = buf.get() & 0xff
          val compression = buf.get() & 0xff
          val filterMethod = buf.get() & 0xff
          val interlace = buf.get() & 0xff
          // truecolor 8-bit only; both interlace methods supported
          if (width <= 0 || height <= 0 || bitDepth != 8 || colourType != 2 ||
            compression != 0 || filterMethod != 0 || interlace > 1) return None
          interlaced = interlace == 1
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          val chunk = new Array[Byte](len)
          buf.get(chunk)
          idat.write(chunk)
        case "IEND" =>
          done = true
          buf.position(buf.position() + len)
        case _ => // ancillary chunk — skip
          buf.position(buf.position() + len)
      }
      if (!done) buf.getInt // CRC (trusted input path; corrupt data fails inflate)
    }
    if (!seenIhdr || idat.size() == 0) return None
    // pixel budget guard before allocating (a hostile header could
    // declare huge dims with a tiny body)
    if (width.toLong * height > 64L * 1024 * 1024) return None

    val bpp = 3
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    // total filtered-stream length across non-empty passes
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx), math.max(0, (height - y0 + dy - 1) / dy))
    }
    val rawLen = passes.map { p =>
      val (wp, hp) = passDims(p)
      if (wp == 0 || hp == 0) 0L else (wp.toLong * bpp + 1) * hp
    }.sum
    if (rawLen > Int.MaxValue - 64) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // 0 without finishing = truncated stream or a preset-dictionary
      // request (forbidden in PNG) — bail rather than spin forever
      if (n == 0) { inflater.end(); return None }
      off += n
    }
    inflater.end()
    if (off != raw.length) return None

    val rgb = new Array[Byte](width * height * bpp)
    var rawOff = 0
    var passIdx = 0
    while (passIdx < passes.length) {
      val p = passes(passIdx)
      passIdx += 1
      val (x0, y0, dx, dy) = p
      val (wp, hp) = passDims(p)
      if (wp > 0 && hp > 0) {
        val stride = wp * bpp
        // scanline reconstruction WITHIN the pass: a = left, b = up,
        // c = up-left (the pass is its own sub-image; prev resets)
        val cur = new Array[Int](stride)
        val prev = new Array[Int](stride)
        var j = 0
        while (j < hp) {
          val rowOff = rawOff + j * (stride + 1)
          val filter = raw(rowOff) & 0xff
          var x = 0
          while (x < stride) {
            val v = raw(rowOff + 1 + x) & 0xff
            val a = if (x >= bpp) cur(x - bpp) else 0
            val b = if (j > 0) prev(x) else 0
            val c = if (j > 0 && x >= bpp) prev(x - bpp) else 0
            val rec = filter match {
              case 0 => v
              case 1 => v + a
              case 2 => v + b
              case 3 => v + (a + b) / 2
              case 4 =>
                val pp = a + b - c
                val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
                v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
              case _ => return None
            }
            cur(x) = rec & 0xff
            x += 1
          }
          // de-interleave this pass row into the raster
          var ii = 0
          while (ii < wp) {
            val tx = x0 + ii * dx
            val ty = y0 + j * dy
            val dst = (ty * width + tx) * bpp
            rgb(dst) = cur(ii * bpp).toByte
            rgb(dst + 1) = cur(ii * bpp + 1).toByte
            rgb(dst + 2) = cur(ii * bpp + 2).toByte
            ii += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          j += 1
        }
        rawOff += (stride + 1) * hp
      }
    }
    Some((width, height, rgb))
  }

  /** Encode row-major top-down RGB triplets as PNG via the JDK's own
    * ImageIO writer (the decode side above is the hand-rolled half of
    * the round-trip). `interlaced = true` asks the JDK writer for
    * progressive mode — Adam7 — exercising the seven-pass decode arm
    * against an independent implementation.
    */
  def encodeViaImageIO(width: Int, height: Int, rgb: Array[Byte],
                       interlaced: Boolean = false): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // r17: bulk-set the pixel array (one raster write, not w·h setRGB
    // color-model round trips)
    val px = new Array[Int](width * height)
    var i = 0
    while (i < px.length) {
      val p = i * 3
      px(i) = ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    // r17 (the Gif.encodeViaImageIO fix): same JDK encoder, same
    // bytes, but the writer is per-thread and the stream memory-backed
    // — ImageIO.write / createImageOutputStream default to a DISK
    // cache file per image plus a registry scan per call.
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val writer = pngWriter.get()
    writer.setOutput(ios)
    if (!interlaced) writer.write(img)
    else {
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    }
    ios.flush()
    writer.setOutput(null)
    out.toByteArray
  }

  /** One JDK PNG writer per thread (not thread-safe; executor task
    * threads are a fixed pool, so this amortises registry lookup +
    * instantiation across a partition).
    */
  private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "JDK PNG writer missing")
      it.next()
    }
  }
}
