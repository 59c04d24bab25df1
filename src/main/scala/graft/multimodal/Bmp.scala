package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal 24-bit uncompressed BMP codec — REAL image PIXEL decode
  * with zero native dependencies (the BITMAPINFOHEADER container and
  * BI_RGB 24-bit pixel array are fully specified public formats;
  * parsing them needs only little-endian arithmetic and row-padding
  * math). This upgrades the image leg of the multimodal surface from
  * header-dims-only to actual pixel access for the one raster format
  * the JDK-free path can handle exactly — the image twin of `Wav`'s
  * audio decode; compressed formats (PNG/JPEG) keep their
  * header-dims + ImageIO tier.
  *
  * Decode validates the BM magic, header sizes, BI_RGB 24 bpp, walks
  * the bottom-up padded rows and folds pixels into EXACT integer
  * statistics (per-channel sums, peak channel value) — integer
  * outputs are engine-portable, so the q70 oracle reconstructs them
  * bit-for-bit from the synthesis arithmetic.
  */
object Bmp {

  /** Exact integer decode result; `valid=false` rows carry zeros
    * (crawl-scale contract: malformed payloads yield a row, never an
    * exception).
    */
  final case class BmpInfo(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, peak: Int,
      valid: Boolean)

  private val Invalid = BmpInfo(0, 0, 0L, 0L, 0L, 0, valid = false)

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode row-major top-down RGB triplets (r(x,y) = rgb(3*(y*w+x)),
    * …) as a standard 54-byte-header bottom-up 24-bit BMP.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val stride = rowStride(width)
    val dataLen = stride * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(dataLen) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = height - 1
    while (y >= 0) { // bottom-up rows, BGR byte order, zero padding
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        buf.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p))
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a BMP payload into exact integer pixel statistics. */
  def decode(bytes: Array[Byte]): BmpInfo = {
    if (bytes == null || bytes.length < 54) return Invalid
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) return Invalid
    buf.getInt; buf.getInt // declared size, reserved; trust array bounds
    val pixelOffset = buf.getInt
    val dibSize = buf.getInt
    if (dibSize < 40) return Invalid
    val width = buf.getInt
    val height = buf.getInt // negative = top-down; only bottom-up in scope
    val planes = buf.getShort
    val bpp = buf.getShort
    val compression = buf.getInt
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 || compression != 0)
      return Invalid // BI_RGB 24-bit bottom-up only; others stay on the ImageIO tier
    val stride = rowStride(width)
    if (pixelOffset < 54 || pixelOffset.toLong + stride.toLong * height > bytes.length)
      return Invalid
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
    var y = 0
    while (y < height) {
      var pos = pixelOffset + y * stride
      var x = 0
      while (x < width) {
        val b = bytes(pos) & 0xff
        val g = bytes(pos + 1) & 0xff
        val r = bytes(pos + 2) & 0xff
        sumB += b; sumG += g; sumR += r
        if (r > peak) peak = r
        if (g > peak) peak = g
        if (b > peak) peak = b
        pos += 3
        x += 1
      }
      y += 1
    }
    BmpInfo(width, height, sumR, sumG, sumB, peak, valid = true)
  }

  /** Parse a BMP payload into top-down row-major RGB triplets (the
    * inverse of `encode`) — the pixel-access tier the OCR kernel
    * needs; None for anything outside the BI_RGB 24-bit bottom-up
    * contract.
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 54) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) return None
    buf.getInt; buf.getInt
    val pixelOffset = buf.getInt
    val dibSize = buf.getInt
    if (dibSize < 40) return None
    val width = buf.getInt
    val height = buf.getInt
    val planes = buf.getShort
    val bpp = buf.getShort
    val compression = buf.getInt
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 || compression != 0)
      return None
    val stride = rowStride(width)
    if (pixelOffset < 54 || pixelOffset.toLong + stride.toLong * height > bytes.length)
      return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) { // file rows are bottom-up; emit top-down
      var pos = pixelOffset + y * stride
      val row = height - 1 - y
      var x = 0
      while (x < width) {
        val p = (row * width + x) * 3
        rgb(p) = bytes(pos + 2) // R
        rgb(p + 1) = bytes(pos + 1) // G
        rgb(p + 2) = bytes(pos) // B
        pos += 3
        x += 1
      }
      y += 1
    }
    Some((width, height, rgb))
  }
}
