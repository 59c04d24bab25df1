package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal PNG truecolor decoder — REAL compressed-image PIXEL decode
  * with zero native dependencies: the PNG container (chunk walk),
  * DEFLATE stream (JDK `java.util.zip.Inflater`), and all five
  * scanline filter reconstructions (None/Sub/Up/Average/Paeth) are
  * fully specified public formats. This moves PNG from the
  * header-dims-only tier into the real-decode tier next to `Bmp` and
  * `Wav` — the remaining genuinely-native stubs shrink to lossy
  * codecs (JPEG pixels, MP3/AAC) and OCR.
  *
  * Scope: 8-bit-depth, colour type 2 (truecolor RGB), non-interlaced
  * — exactly what the JDK's own ImageIO PNG writer emits for opaque
  * RGB images, so encode-with-ImageIO / decode-by-hand round-trips
  * (PngSpec cross-checks both directions). Other colour types /
  * interlacing return invalid and stay on the ImageIO tier.
  *
  * Decode folds reconstructed pixels into EXACT integer statistics
  * (per-channel sums, peak) — engine-portable, so the q80 oracle
  * rebuilds them bit-for-bit from the synthesis arithmetic without
  * ever seeing a PNG byte.
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

  /** Parse a PNG payload into exact integer pixel statistics. */
  def decode(bytes: Array[Byte]): PngInfo = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => Invalid }
  }

  private def decodeOrThrow(bytes: Array[Byte]): PngInfo = {
    if (bytes == null || bytes.length < 8 + 25) return Invalid
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return Invalid; i += 1 }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(8)
    var width = 0; var height = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt
      if (len < 0 || len > buf.remaining() - 8) return Invalid
      val ctype = new String(Array(buf.get(), buf.get(), buf.get(), buf.get())
        .map(b => (b & 0xff).toChar))
      ctype match {
        case "IHDR" =>
          if (len != 13) return Invalid
          width = buf.getInt; height = buf.getInt
          val bitDepth = buf.get() & 0xff
          val colourType = buf.get() & 0xff
          val compression = buf.get() & 0xff
          val filterMethod = buf.get() & 0xff
          val interlace = buf.get() & 0xff
          // truecolor 8-bit non-interlaced only; everything else stays
          // on the ImageIO tier
          if (width <= 0 || height <= 0 || bitDepth != 8 || colourType != 2 ||
            compression != 0 || filterMethod != 0 || interlace != 0) return Invalid
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return Invalid
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
    if (!seenIhdr || idat.size() == 0) return Invalid
    // pixel budget guard before allocating (a hostile header could
    // declare huge dims with a tiny body)
    if (width.toLong * height > 64L * 1024 * 1024) return Invalid

    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // 0 without finishing = truncated stream or a preset-dictionary
      // request (forbidden in PNG) — bail rather than spin forever
      if (n == 0) { inflater.end(); return Invalid }
      off += n
    }
    inflater.end()
    if (off != raw.length) return Invalid

    // scanline reconstruction: a = left, b = up, c = up-left
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      var x = 0
      while (x < stride) {
        val v = raw(rowOff + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (y > 0 && x >= bpp) prev(x - bpp) else 0
        val rec = filter match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return Invalid
        }
        cur(x) = rec & 0xff
        x += 1
      }
      x = 0
      while (x < stride) {
        val ch = cur(x)
        (x % 3) match {
          case 0 => sumR += ch
          case 1 => sumG += ch
          case _ => sumB += ch
        }
        if (ch > peak) peak = ch
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    PngInfo(width, height, sumR, sumG, sumB, peak, valid = true)
  }

  /** Encode row-major top-down RGB triplets as PNG via the JDK's own
    * ImageIO writer (the decode side above is the hand-rolled half of
    * the round-trip).
    */
  def encodeViaImageIO(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
