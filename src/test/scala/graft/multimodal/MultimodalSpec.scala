package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "some pretend image bytes"),
    (2L, ""),
    (3L, "a" * 200)
  ).toDF("doc_id", "text")

  test("binary payload + stub decode produces typed, deterministic metadata") {
    val d = Multimodal.asBinaryPayload(docs, "text")
    val meta1 = Multimodal.decodeMeta(d).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.decodeMeta(d).collect().sortBy(_.doc_id)
    assert(meta1.toSeq == meta2.toSeq) // deterministic stub
    val m1 = meta1.find(_.doc_id == 1L).get
    assert(m1.byte_size == 24L && m1.success && m1.content_sha.length == 64)
    assert(m1.width >= 64 && m1.height >= 64)
    val m2 = meta1.find(_.doc_id == 2L).get
    assert(m2.byte_size == 0L && !m2.success)
  }

  test("real PNG/JPEG payloads decode actual dimensions via javax.imageio") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos))
      baos.toByteArray
    }
    val png = imageBytes(37, 21, "png")
    val jpg = imageBytes(48, 64, "jpg")
    val d = Seq((10L, png), (11L, jpg), (12L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(d).collect().map(m => m.doc_id -> m).toMap
    assert(meta(10L).format == "png" && meta(10L).width == 37 && meta(10L).height == 21)
    assert(meta(11L).format == "jpeg" && meta(11L).width == 48 && meta(11L).height == 64)
    assert(meta(10L).ocr_text == "" && meta(10L).success)
    // non-image payloads keep the deterministic stub derivation
    assert(meta(12L).width >= 64 && meta(12L).ocr_text == "not an image")
  }

  test("format sniff agrees with the q30 oracle CASE on text payloads, including BM/GIF prefixes") {
    // The q30 DuckDB twin (OracleSql "q30_multimodal") derives `format`
    // as: GIF if >= 6 bytes and text LIKE 'GIF%'; BMP if text LIKE
    // 'BM%'; else byte-length parity. The round-4 verdict flagged that
    // the old parity-only oracle would hash-mismatch on any corpus doc
    // whose text starts with the printable "BM"/"GIF" magics — this
    // spec pins the agreement on exactly those adversarial prefixes.
    def oracleFormat(text: String): String = {
      val n = text.getBytes("UTF-8").length
      if (n >= 6 && text.startsWith("GIF")) "gif"
      else if (text.startsWith("BM")) "bmp"
      else if (n % 2 == 0) "png"
      else "jpeg"
    }
    val texts = Seq(
      "BM",                        // 2-byte BMP magic alone
      "BMW dealership menu, page", // ordinary text that happens to start with BM
      "GIF89a-style banner text",  // >= 6 bytes, GIF prefix → gif
      "GIF",                       // GIF prefix but < 6 bytes → parity (jpeg: 3 odd)
      "GIFs!",                     // 5 bytes < 6 → parity (jpeg: 5 odd)
      "plain menu text",           // no magic, odd length
      "even menu text!!",          // no magic, even length
      "")                          // empty → parity (png)
    val d = Multimodal.asBinaryPayload(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), "text")
    val got = Multimodal.decodeMeta(d).collect().map(m => m.doc_id -> m.format).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == oracleFormat(t),
        s"doc $i (${t.take(12)}): spark=${got(i.toLong)} oracle=${oracleFormat(t)}")
    }
    assert(got(0L) == "bmp" && got(1L) == "bmp" && got(2L) == "gif" && got(3L) == "jpeg")
  }

  test("three-tier method routing: text / vision (image payload) / ocr") {
    val png = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val d = Seq(
      (1L, 500L, "long rich text".getBytes("UTF-8")),   // rich text → text
      (2L, 20L, png),                                   // low text + image → vision
      (3L, 20L, "short".getBytes("UTF-8"))              // low text, no image → ocr
    ).toDF("doc_id", "n_chars", "payload")
    val routed = d.select(col("doc_id"),
      Multimodal.routeExtractionMethod(col("n_chars"), col("payload")).as("m"))
      .as[(Long, String)].collect().toMap
    assert(routed(1L) == "text" && routed(2L) == "vision" && routed(3L) == "ocr")
  }

  test("extension routing mirrors the reference extractor map") {
    val r = Seq("a.pdf", "b.JPG", "c.png", "d.txt").toDF("path")
      .select(col("path"), Multimodal.routeByExtension("path").as("route"))
      .as[(String, String)].collect().toMap
    assert(r("a.pdf") == "pdf_extractor")
    assert(r("b.JPG") == "image_extractor")
    assert(r("c.png") == "image_extractor")
    assert(r("d.txt") == "unsupported")
  }

  test("resize is REAL for JDK formats: decoded, rescaled, PNG re-encoded") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 53 + y * 101) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos))
      baos.toByteArray
    }
    val d = Seq(
      (1L, imageBytes(120, 80, "png")),
      (2L, imageBytes(33, 57, "jpg")),
      (3L, "definitely not an image payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rs = Multimodal.resize(d, 24, 16).collect().map(r => r.doc_id -> r).toMap
    // real images come back as decodable PNGs with the target geometry
    Seq(1L, 2L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rs(id).payload))
      assert(img != null, s"doc $id: resized payload is not a decodable image")
      assert(img.getWidth == 24 && img.getHeight == 16)
    }
    // deterministic: same input → byte-identical PNG
    val again = Multimodal.resize(d, 24, 16).collect().map(r => r.doc_id -> r).toMap
    assert(rs(1L).payload.toSeq == again(1L).payload.toSeq)
    // non-JDK payloads keep the stub downsample (total record shape)
    assert(rs(3L).width == 24 && rs(3L).height == 16 && rs(3L).payload.nonEmpty)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rs(3L).payload)) == null)
  }

  test("resize + feature extraction stubs: typed, deterministic, ANN-ready") {
    val d = Multimodal.asBinaryPayload(docs, "text")
    val rs = Multimodal.resize(d, 32, 32).collect()
    assert(rs.forall(r => r.width == 32 && r.height == 32))
    val feats = Multimodal.extractFeatures(d, dim = 16)
    assert(feats.columns.toSeq == Seq("doc_id", "embedding"))
    val v1 = feats.filter($"doc_id" === 1L).select("embedding")
      .as[Array[Float]].head()
    val v2 = Multimodal.extractFeatures(d, dim = 16)
      .filter($"doc_id" === 1L).select("embedding").as[Array[Float]].head()
    assert(v1.length == 16 && v1.toSeq == v2.toSeq)
    // plugs straight into the similarity operators
    val top = graft.similarity.CosineTopK.bruteTopK(
      feats.filter($"doc_id" === 1L).withColumnRenamed("doc_id", "query_id"),
      feats.withColumnRenamed("doc_id", "vec_id"), dim = 16, k = 2)
    assert(top.filter($"rank" === 1).select("vec_id").as[Long].head() == 1L)
  }

  test("frame sampling yields ceil(bytes/step) frames per doc") {
    val d = Multimodal.asBinaryPayload(docs, "text")
    val frames = Multimodal.sampleFrames(d, step = 64).collect()
    assert(frames.count(_.doc_id == 3L) == 4) // 200 bytes / 64 → 4 frames
    assert(frames.count(_.doc_id == 2L) == 1) // empty doc still yields 1 stub frame
    assert(frames.filter(_.doc_id == 3L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("imagePixelStats routes BMP and PNG payloads by magic byte in one pass") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 31 % 256).toByte)
    val mixed = Seq(
      (1L, Bmp.encode(4, 3, rgb)),
      (2L, Png.encodeViaImageIO(4, 3, rgb)),
      (3L, "neither format".getBytes)
    ).toDF("doc_id", "payload")
    val out = Multimodal.imagePixelStats(mixed).collect()
      .map(p => p.doc_id -> p).toMap
    assert(out(1L).valid && out(2L).valid && !out(3L).valid)
    // identical pixels through the two decoders → identical statistics
    assert((out(1L).sum_r, out(1L).sum_g, out(1L).sum_b, out(1L).peak) ===
      ((out(2L).sum_r, out(2L).sum_g, out(2L).sum_b, out(2L).peak)))
    assert(out(1L).width === 4 && out(2L).width === 4)
  }
}
