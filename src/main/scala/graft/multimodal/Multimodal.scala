package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as
  * an opaque `binary` column plus a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run per-partition in
  * batches.
  *
  * The reference reaches this surface through PaddleOCR + pdfplumber
  * + PIL (restaurant_etl/extractors/pdf_extractor.py:28 extract_text,
  * :68 _ocr_pdf; image_extractor.py:16 extract_text) — native decode
  * libraries that mostly do not exist in this container. Decode status:
  *  - IMAGE DIMENSIONS ARE REAL for JDK-supported formats (PNG/JPEG/
  *    GIF/BMP): magic-byte sniff + `javax.imageio` header-only read
  *    (no full pixel decode, so it stays cheap at scale).
  *  - RESIZE IS REAL for JDK-decodable payloads: full `ImageIO`
  *    decode + bilinear `Graphics2D` rescale + PNG re-encode; only
  *    non-JDK formats fall back to the byte-stride stub.
  *  - PIXEL DECODE IS REAL for every image format the testbed can
  *    produce: BMP ([[Bmp]]), PNG ([[Png]] — inflate + all five
  *    filters), GIF ([[Gif]] — LZW + palette walk), and baseline
  *    JPEG ([[Jpeg]] — Huffman + IDCT + 4:2:0 upsampling);
  *    `imagePixelStats` routes by magic bytes.
  *  - PDF TEXT-LAYER EXTRACTION IS REAL ([[Pdf]] — classic xref walk,
  *    object grammar, FlateDecode via JDK `Inflater`, page tree,
  *    BT/ET + Tj/TJ/'/" text operators): the reference's PRIMARY
  *    input path (pdf_extractor.py:28 extract_text / pdfplumber) —
  *    `pdfTextStats` routes by `%PDF` magic.
  *  - AUDIO DECODE IS REAL for WAV/PCM payloads ([[Wav]]: RIFF chunk
  *    walk + exact integer sample statistics — `audioFeatures`);
  *    native-codec formats keep a real container-metadata tier where
  *    the container is public arithmetic (`Mp3` frame-header walk:
  *    frame count / bitrate / sample-exact duration) while their
  *    SAMPLE decode (MP3 filterbank+IMDCT, AAC, opus) stays out of
  *    scope.
  *  - OCR IS REAL for machine-rendered text in BOTH pitches ([[Ocr]]:
  *    fixed-grid classification with provable 1-flip recovery, q94;
  *    proportional-width segmentation + exact form lookup, q121);
  *    photographic/skewed OCR, feature-extract and video-frame
  *    kernels remain DETERMINISTIC STUBS (=== STUB ... ===); the
  *    Spark-side contract
  *    — schema, binary transport, partition-batched execution, output
  *    shape — is real, tested, and is exactly where a JNI/ONNX/PIL
  *    equivalent kernel would plug in.
  *
  * Scale notes: decode is the canonical map-heavy stage — no shuffle,
  * CPU-bound, so throughput scales linearly with executors;
  * `mapPartitions` amortizes any per-batch model/codec init (the same
  * reason the reference caches its PaddleOCR singleton).
  */
object Multimodal {

  // r17: javax.imageio streams default to a DISK cache file per
  // image (create/write/delete a temp file for every payload read or
  // written through ImageIO) — memory-backed streams decode the same
  // bytes without the filesystem round trip. JVM-global, set once.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaMeta(
      doc_id: Long,
      byte_size: Long,
      content_sha: String,
      format: String,
      width: Int,
      height: Int,
      ocr_text: String,
      success: Boolean)

  case class Frame(doc_id: Long, frame_idx: Int, frame_sha: String)

  /** Wrap a text/bytes column as the opaque media payload column.
    * (With real files use `spark.read.format("binaryFile")`, which
    * yields the same (path, length, content) shape.)
    */
  def asBinaryPayload(df: DataFrame, col0: String): DataFrame =
    df.withColumn("payload", col(col0).cast("binary"))

  /** File-extension routing, mirroring the reference's
    * UniversalExtractor.extractor_map (universal_extractor.py:16). */
  def routeByExtension(pathCol: String): org.apache.spark.sql.Column = {
    val ext = lower(regexp_extract(col(pathCol), "\\.([A-Za-z0-9]+)$", 1))
    when(ext === "pdf", "pdf_extractor")
      .when(ext.isin("jpg", "jpeg", "png", "bmp", "tiff", "tif"), "image_extractor")
      .otherwise("unsupported")
  }

  /** Three-tier extraction-METHOD routing, the "BetterVersion" shape
    * (reference: BetterVersion/pdf_extractor.py:50 — rich text stays
    * "text", low-text documents fall back to the Azure
    * document-intelligence service, i.e. a VISION OCR tier
    * (BetterVersion/azure_ocr_extractor.py); mainline's plain "ocr"
    * remains for low-text non-image payloads). Pure column logic: the
    * magic-byte sniff runs on the binary payload prefix, so routing is
    * map-side and never decodes anything.
    */
  def routeExtractionMethod(nChars: Column, payload: Column,
                            lowTextThreshold: Int = 100): Column = {
    val magic = upper(hex(substring(payload, 1, 4)))
    val isImage = magic.startsWith("89504E47") || magic.startsWith("FFD8") ||
      magic.startsWith("474946") || magic.startsWith("424D") ||
      magic === "49492A00" || magic === "4D4D002A"
    when(nChars >= lowTextThreshold, "text")
      .when(isImage, "vision")
      .otherwise("ocr")
  }

  /** Magic-byte format sniff for the image formats the JDK decodes. */
  private[multimodal] def sniffImageFormat(d: Array[Byte]): Option[String] =
    if (d.length >= 8 && d(0) == 0x89.toByte && d(1) == 'P' && d(2) == 'N' && d(3) == 'G') Some("png")
    else if (d.length >= 3 && d(0) == 0xFF.toByte && d(1) == 0xD8.toByte) Some("jpeg")
    else if (d.length >= 6 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F') Some("gif")
    else if (d.length >= 2 && d(0) == 'B' && d(1) == 'M') Some("bmp")
    else None

  /** Header-only dimension read via `javax.imageio` — the reader
    * parses only the image header (`getWidth(0)` on an un-decoded
    * input), never the pixel data, so this costs O(header) per file
    * regardless of image size.
    */
  private[multimodal] def readImageDims(data: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(data))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      } else None
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Batched decode: one pass per partition, init-once-per-batch
    * shape. Output is a typed Dataset with the metadata schema.
    * Real images (PNG/JPEG/GIF/BMP magic) get their actual format and
    * header-decoded width/height; other payloads keep the
    * deterministic stub derivation so the record shape is total.
    */
  def decodeMeta(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val data = if (bytes == null) Array.emptyByteArray else bytes
          val sha = digest.digest(data).map("%02x".format(_)).mkString
          val magic = sniffImageFormat(data)
          val dims = magic.flatMap(_ => readImageDims(data))
          // Non-image payloads (video, opaque bytes): STUB decode,
          // deterministic fake dims from content. (TIFF pixel decode
          // is real — `Tiff` — on the stats path below.)
          val h = java.util.Arrays.hashCode(data)
          MediaMeta(
            doc_id = id,
            byte_size = data.length.toLong,
            content_sha = sha,
            format = magic.getOrElse(if (data.length % 2 == 0) "png" else "jpeg"),
            width = dims.fold(64 + math.floorMod(h, 1024))(_._1),
            height = dims.fold(64 + math.floorMod(h >> 10, 1024))(_._2),
            // === STUB: real OCR (PaddleOCR equivalent) plugs in here;
            // images yield empty text, other payloads a byte-prefix. ===
            ocr_text =
              if (magic.isDefined) ""
              else new String(data.take(64), java.nio.charset.StandardCharsets.UTF_8),
            success = data.nonEmpty)
        }
      }
  }

  case class Resized(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Real bilinear resize + PNG re-encode via `java.awt`/`ImageIO`
    * for a decoded BufferedImage. Package-visible for the spec. */
  private[multimodal] def resizeImage(img: java.awt.image.BufferedImage,
                                      targetW: Int, targetH: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** Resize: REAL for JDK-decodable payloads (PNG/JPEG/GIF/BMP magic
    * that `ImageIO` can decode) — full pixel decode, bilinear rescale
    * to (targetW, targetH), deterministic PNG re-encode; other
    * payloads (TIFF, video, non-image bytes — no codec in the JDK)
    * keep the deterministic byte-stride stub so the record shape stays
    * total. Same per-partition batch shape either way: this is the
    * map-heavy no-shuffle stage where a libvips/PIL kernel would slot
    * in for the remaining formats.
    */
  def resize(df: DataFrame, targetW: Int = 64, targetH: Int = 64,
             idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val data = if (bytes == null) Array.emptyByteArray else bytes
          val real = sniffImageFormat(data).flatMap { _ =>
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data)))
              .map(img => resizeImage(img, targetW, targetH))
            catch { case _: Exception => None }
          }
          real match {
            case Some(png) => Resized(id, targetW, targetH, png)
            case None =>
              // === STUB: non-JDK formats — deterministic byte-stride
              // downsample stands in for a real resampler. ===
              val n = targetW * targetH / 64
              val stride = math.max(1, data.length / math.max(1, n))
              Resized(id, targetW, targetH, data.grouped(stride).map(_.head).take(n).toArray)
          }
        }
      }
  }

  /** Feature-extraction stub: a deterministic pseudo-embedding
    * (dim floats) from the payload bytes — the plumbing under
    * "embed images, then near-dup/ANN them with graft.similarity".
    * Real impl: an ONNX/JNI vision encoder in the same mapPartitions
    * batch loop.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64,
                      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // === STUB: encoder init per partition; fake features below. ===
        it.map { case (id, bytes) =>
          val data = if (bytes == null) Array.emptyByteArray else bytes
          val vec = Array.tabulate(dim) { i =>
            var h = 0xcbf29ce484222325L ^ i.toLong
            var j = i
            while (j < data.length) { h ^= data(j); h *= 0x100000001b3L; j += dim }
            (h.toDouble / Long.MaxValue.toDouble).toFloat
          }
          (id, vec)
        }
      }.toDF(idCol, "embedding")
  }

  case class AudioMeta(
      doc_id: Long, sample_rate: Int, n_samples: Long, duration_ms: Long,
      sum_sq: Long, peak_abs: Long, valid: Boolean)

  /** REAL audio decode for WAV/PCM and FLAC payloads (`Wav.decode` —
    * RIFF chunk walk; `Flac.decode` — lossless frame/subframe parse
    * with CRC+MD5 verification; both exact integer sample statistics,
    * no native codec needed): per-doc sample rate, frame count,
    * duration, energy (Σ s²) and peak amplitude, routed by magic
    * bytes (`RIFF` vs `fLaC`). Same batched map-only shape as the
    * image path; malformed payloads yield `valid=false` rows, never
    * exceptions.
    */
  def audioFeatures(df: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload"): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes != null && bytes.length > 3 &&
          bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C') {
          val f = Flac.decode(bytes)
          AudioMeta(id, f.sampleRate, f.nSamples, f.durationMs, f.sumSq, f.peakAbs,
            f.valid && f.md5Ok)
        } else {
          val w = Wav.decode(bytes)
          AudioMeta(id, w.sampleRate, w.nSamples, w.durationMs, w.sumSq, w.peakAbs, w.valid)
        }
      })
  }

  case class PixelMeta(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, peak: Int, valid: Boolean)

  /** REAL image PIXEL decode for BMP, PNG, GIF, JPEG and TIFF
    * payloads (`Bmp` / `Png` / `Gif` / `Jpeg` / `Tiff` — every format
    * on the reference's supported-image list, no codec library): the
    * image twin of `audioFeatures`. Same batched map-only shape;
    * malformed payloads yield `valid=false` rows, never exceptions.
    */
  def imagePixelStats(df: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload"): Dataset[PixelMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // magic-byte routing between the five real pixel decoders:
        // PNG signature → hand-rolled inflate+unfilter (Png); GIF →
        // hand-rolled LZW + palette walk (Gif); JPEG SOI → hand-rolled
        // baseline Huffman+IDCT (Jpeg); II*\0 / MM\0* → hand-rolled
        // IFD walk + PackBits/TIFF-LZW (Tiff); else BMP (Bmp.decode
        // returns invalid for anything that isn't BM)
        if (bytes != null && bytes.length > 0 && (bytes(0) & 0xff) == 0x89) {
          val p = Png.decode(bytes)
          PixelMeta(id, p.width, p.height, p.sumR, p.sumG, p.sumB, p.peak, p.valid)
        } else if (bytes != null && bytes.length > 2 &&
          bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
          val g = Gif.decode(bytes)
          PixelMeta(id, g.width, g.height, g.sumR, g.sumG, g.sumB, g.peak, g.valid)
        } else if (bytes != null && bytes.length > 1 &&
          (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
          val j = Jpeg.decode(bytes)
          PixelMeta(id, j.width, j.height, j.sumR, j.sumG, j.sumB, j.peak, j.valid)
        } else if (bytes != null && bytes.length > 3 &&
          ((bytes(0) == 'I' && bytes(1) == 'I' && (bytes(2) & 0xff) == 0x2a && bytes(3) == 0) ||
            (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && (bytes(3) & 0xff) == 0x2a))) {
          val t = Tiff.decode(bytes)
          PixelMeta(id, t.width, t.height, t.sumR, t.sumG, t.sumB, t.peak, t.valid)
        } else if (bytes != null && bytes.length > 11 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P') {
          val wp = Webp.decode(bytes)
          PixelMeta(id, wp.width, wp.height, wp.sumR, wp.sumG, wp.sumB, wp.peak, wp.valid)
        } else {
          val b = Bmp.decode(bytes)
          PixelMeta(id, b.width, b.height, b.sumR, b.sumG, b.sumB, b.peak, b.valid)
        }
      })
  }

  case class PdfMeta(doc_id: Long, n_pages: Int, n_chars: Long, text: String, valid: Boolean)

  /** REAL PDF text-layer extraction (`Pdf.decode` — classic xref →
    * object graph → page tree → FlateDecode → text operators; the
    * reference's primary input path, pdf_extractor.py:28): the
    * document twin of `audioFeatures`/`imagePixelStats`. `%PDF`
    * magic routes; anything else (and any unsupported PDF feature —
    * xref streams, encryption, non-Flate filters) yields a
    * `valid=false` row, never an exception.
    */
  def pdfTextStats(df: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload"): Dataset[PdfMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val p = Pdf.decode(bytes)
        PdfMeta(id, p.nPages, p.nChars, p.text, p.valid)
      })
  }

  case class PdfImageMeta(
      doc_id: Long, img_idx: Int, width: Int, height: Int,
      n_bytes: Int, sum_r: Long, sum_g: Long, sum_b: Long, valid: Boolean)

  /** REAL embedded-image extraction (`Pdf.decodeImages` — the page
    * tree's /XObject /Subtype /Image entries through the full filter
    * CHAIN: FlateDecode, LZWDecode and DCTDecode via the in-repo
    * Jpeg decoder; pdf_extractor.py pairs its text pull with exactly
    * this per-page image walk). Explode-per-image (flatMap), the
    * same map-only crawl shape as [[sampleFrames]]: a document
    * yields zero rows when unreadable, and a single bad image yields
    * its own `valid=false` row without hiding its siblings.
    */
  def pdfImageStats(df: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload"): Dataset[PdfImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    // a null id would NPE the non-nullable tuple encoder at runtime;
    // crawl rows without an id yield nothing, like unreadable payloads
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Pdf.decodeImages(bytes).map(im =>
          PdfImageMeta(id, im.imgIdx, im.width, im.height, im.nBytes,
            im.sumR, im.sumG, im.sumB, im.valid))
      }
  }

  case class VideoMeta(
      doc_id: Long, width: Long, height: Long, n_frames: Long,
      n_sampled: Long, duration_ms: Long, sum_r: Long, sum_g: Long,
      sum_b: Long, peak: Long, valid: Boolean)

  /** REAL video frame sampling (`Avi.decode` — RIFF/AVI container
    * walk + per-frame baseline-JPEG sample decode through the proven
    * `Jpeg` path): every `step`-th frame of each clip is decoded and
    * folded into exact integer statistics. This is the frame-sampling
    * contract of a training-data pipeline at 100 TB — sample k frames
    * per clip, never decode-all — and it is MAP-ONLY: one row in, one
    * row out, no shuffle, the per-partition cost bounded by
    * frames/step × pixels. Malformed clips yield `valid=false` rows.
    * Transform-coded video (H.264+) stays on the declared native-stub
    * tier (SURVEY §6); [[sampleFrames]] remains the format-agnostic
    * fingerprint stub for those payloads.
    */
  def videoFrameStats(df: DataFrame, step: Int = 1,
                      idCol: String = "doc_id",
                      payloadCol: String = "payload"): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = Avi.decode(bytes, step)
        VideoMeta(id, v.width, v.height, v.nFrames, v.nSampled,
          v.durationMs, v.sumR, v.sumG, v.sumB, v.peak, v.valid)
      })
  }

  case class Mp4Meta(
      doc_id: Long, movie_timescale: Long, duration_ms: Long,
      n_tracks: Long, handler: String, media_timescale: Long,
      media_duration_ms: Long, n_samples: Long, n_keyframes: Long,
      sum_sample_bytes: Long, max_sample_bytes: Long, valid: Boolean)

  /** ISO-BMFF container metadata walk (`Mp4.decode`): the route/
    * filter/sample fields a curation pipeline reads BEFORE any codec
    * work — duration, track handler, sample counts/sizes, keyframe
    * density. MAP-ONLY: one row in, one row out, no shuffle; sample
    * DATA stays opaque (the declared native-stub tier for H.264/AAC,
    * SURVEY §6). Malformed payloads yield `valid=false` rows.
    */
  def mp4Meta(df: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): Dataset[Mp4Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Mp4.decode(bytes)
        Mp4Meta(id, m.movieTimescale, m.durationMs, m.nTracks, m.handler,
          m.mediaTimescale, m.mediaDurationMs, m.nSamples, m.nKeyframes,
          m.sumSampleBytes, m.maxSampleBytes, m.valid)
      })
  }

  case class GifAnimMeta(
      doc_id: Long, width: Long, height: Long, n_frames: Long,
      n_sampled: Long, duration_ms: Long, sum_r: Long, sum_g: Long,
      sum_b: Long, peak: Long, valid: Boolean)

  /** Animated-GIF frame sampling (`Gif.decodeFrames`): the web's
    * de-facto third video container under the q169 contract — decode
    * every `step`-th frame to exact integer statistics, sum every
    * frame's graphic-control delay for the duration, MAP-ONLY.
    */
  def gifFrameStats(df: DataFrame, step: Int = 1,
                    idCol: String = "doc_id",
                    payloadCol: String = "payload"): Dataset[GifAnimMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = Gif.decodeFrames(bytes, step)
        GifAnimMeta(id, v.width, v.height, v.nFrames, v.nSampled,
          v.durationMs, v.sumR, v.sumG, v.sumB, v.peak, v.valid)
      })
  }

  case class OggMeta(
      doc_id: Long, n_pages: Long, n_packets: Long, n_streams: Long,
      channels: Long, sample_rate: Long, granule_max: Long,
      duration_ms: Long, valid: Boolean)

  /** Ogg container walk (`Ogg.decode`): CRC-verified pages, lacing
    * packet counts, stream serials, Vorbis id-header channels/rate
    * and the granule-clock duration — the pre-codec route/filter
    * metadata tier, MAP-ONLY at any corpus size.
    */
  def oggMeta(df: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): Dataset[OggMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val o = Ogg.decode(if (bytes == null) Array.emptyByteArray else bytes)
        OggMeta(id, o.nPages.toLong, o.nPackets, o.nStreams.toLong,
          o.channels.toLong, o.sampleRate, o.granuleMax, o.durationMs, o.valid)
      })
  }

  case class MkvMeta(
      doc_id: Long, doc_type: String, timestamp_scale: Long,
      duration_ms: Long, n_tracks: Long, track_type: Long,
      codec_id: String, width: Long, height: Long, channels: Long,
      n_clusters: Long, n_blocks: Long, n_keyframes: Long, valid: Boolean)

  /** Matroska/WebM container walk (`Matroska.decode`): EBML tree,
    * track identity, granule-exact duration, cluster/block/keyframe
    * counts — the pre-codec route/filter tier, MAP-ONLY.
    */
  def mkvMeta(df: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): Dataset[MkvMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Matroska.decode(if (bytes == null) Array.emptyByteArray else bytes)
        MkvMeta(id, m.docType, m.timestampScale, m.durationMs, m.nTracks.toLong,
          m.trackType, m.codecId, m.width, m.height, m.channels,
          m.nClusters, m.nBlocks, m.nKeyframes, m.valid)
      })
  }

  /** Frame sampling stub: every media doc yields ceil(bytes/step)
    * frame fingerprints — the Spark shape of video frame extraction
    * (explode-per-item, bounded by content size) for the codecs that
    * stay on the native-stub tier; RIFF/AVI MJPEG clips get the real
    * decode in [[videoFrameStats]].
    */
  def sampleFrames(df: DataFrame, step: Int = 64, idCol: String = "doc_id",
                   payloadCol: String = "payload"): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val data = if (bytes == null) Array.emptyByteArray else bytes
        val n = math.max(1, (data.length + step - 1) / step)
        // === STUB: real frame decode happens here. ===
        (0 until n).map { i =>
          val slice = data.slice(i * step, math.min((i + 1) * step, data.length))
          Frame(id, i, f"${java.util.Arrays.hashCode(slice)}%08x")
        }
      }
  }
}
