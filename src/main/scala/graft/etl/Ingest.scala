package graft.etl

import graft.functions.Utf8
import graft.multimodal.{Tar, Warc, Zip}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ARCHIVE → CORPUS ingestion: the uniform front door that turns the
  * containers a crawl actually delivers (WARC / ZIP / tar, plain or
  * gzipped) into per-entry text rows ready for the rest of the
  * engine — `Utf8.decodeReplacing` runs here (bytes may be anything),
  * markup strip / quality gates / dedup stay downstream column
  * stages (`TextFunctions.stripMarkup`, `CorpusPipeline.curate`).
  *
  * Routing is by CONTENT, not file extension: the outer compression
  * layer — gzip, an LZ4 frame, a Zstandard frame, a bzip2 stream,
  * or an XZ stream — is unwrapped once (a `.warc.gz` and a
  * `.tar.gz` share the same outer magic; same for `.lz4`/`.zst`/
  * `.bz2`/`.xz`), then the inner bytes sniff as WARC (`WARC/`
  * prefix), ZIP (`PK\3\4`), ustar (magic at offset 257), Avro OCF
  * (`Obj\1` — one row per record, string fields as text), or
  * TFRecord (no magic: the masked length-CRC32C is the format's own
  * self-identification — one row per tf.Example, bytes features as
  * text); anything else is treated as a raw text payload. One row per extracted entry — a WARC response, a
  * ZIP entry, a tar regular file — with the UTF-8 repair count
  * carried per row. Malformed archives yield zero rows plus one
  * `valid=false` marker row so corrupt inputs are visible, not
  * silently dropped. Map-only at any corpus scale.
  */
object Ingest {

  final case class IngestedDoc(
      archive_id: Long, format: String, entry: String,
      text: String, n_invalid_utf8: Long, valid: Boolean)

  private def unwrapOuter(raw: Array[Byte]): Array[Byte] =
    if (raw != null && raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
      try {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw), 8192)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } catch { case _: Exception => raw }
    } else if (raw != null && raw.length >= 4 &&
      (raw(0) & 0xff) == 0x04 && (raw(1) & 0xff) == 0x22 &&
      (raw(2) & 0xff) == 0x4d && (raw(3) & 0xff) == 0x18) {
      try graft.multimodal.Lz4.decompressFrame(raw).data
      catch { case _: Exception => raw }
    } else if (raw != null && raw.length >= 4 &&
      (raw(0) & 0xff) == 0x28 && (raw(1) & 0xff) == 0xb5 &&
      (raw(2) & 0xff) == 0x2f && (raw(3) & 0xff) == 0xfd) {
      try graft.multimodal.Zstd.decompress(raw).data
      catch { case _: Exception => raw }
    } else if (raw != null && raw.length >= 4 &&
      raw(0) == 'B' && raw(1) == 'Z' && raw(2) == 'h' &&
      raw(3) >= '1' && raw(3) <= '9') {
      try graft.multimodal.Bzip2.decompress(raw).data
      catch { case _: Exception => raw }
    } else if (raw != null && raw.length >= 6 &&
      (raw(0) & 0xff) == 0xfd && raw(1) == '7' && raw(2) == 'z' &&
      raw(3) == 'X' && raw(4) == 'Z' && raw(5) == 0) {
      try graft.multimodal.Xz.decompress(raw).data
      catch { case _: Exception => raw }
    } else raw

  private[etl] def sniff(inner: Array[Byte]): String =
    if (inner == null || inner.length < 4) "raw"
    else if (inner.length >= 5 && inner(0) == 'W' && inner(1) == 'A' && inner(2) == 'R' &&
      inner(3) == 'C' && inner(4) == '/') "warc"
    else if (inner(0) == 'P' && inner(1) == 'K' && inner(2) == 3 && inner(3) == 4) "zip"
    else if (inner.length > 262 &&
      new String(inner, 257, 5, java.nio.charset.StandardCharsets.US_ASCII) == "ustar") "tar"
    else if (inner(0) == 'O' && inner(1) == 'b' && inner(2) == 'j' && inner(3) == 1) "avro"
    // "ORC" is also plausible English text — demand the full postscript
    // walk succeeds before routing (cheap: the tail is already in hand)
    else if (inner(0) == 'O' && inner(1) == 'R' && inner(2) == 'C' &&
      graft.sources.OrcRead.read(inner).valid) "orc"
    else if (looksLikeTfRecord(inner)) "tfrecord"
    else "raw"

  /** TFRecord has no magic; its framing is self-identifying instead —
    * the masked CRC32C of the first length word matching is a
    * 1-in-2^32 accident on non-TFRecord bytes.
    */
  private def looksLikeTfRecord(b: Array[Byte]): Boolean =
    b.length >= 12 && {
      val stored = (b(8) & 0xff) | ((b(9) & 0xff) << 8) |
        ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24)
      graft.multimodal.TfRecord.maskedCrc(b, 0, 8) == stored
    }

  /** Extract one IngestedDoc per archive entry. */
  private[graft] def extractOne(id: Long, raw: Array[Byte]): Seq[IngestedDoc] = {
    val inner = unwrapOuter(raw)
    def doc(fmt: String, entry: String, content: Array[Byte]): IngestedDoc = {
      val (text, bad) = Utf8.decodeReplacing(content)
      IngestedDoc(id, fmt, entry, text, bad.toLong, valid = true)
    }
    sniff(inner) match {
      case "warc" =>
        val rs = Warc.responses(inner)
        if (rs.isEmpty) Seq(IngestedDoc(id, "warc", "", "", 0L, valid = false))
        else rs.map(r => doc("warc", r.uri,
          r.body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case "zip" =>
        val es = Zip.entries(inner)
        if (es.isEmpty) Seq(IngestedDoc(id, "zip", "", "", 0L, valid = false))
        else es.map { case (name, content) => doc("zip", name, content) }
      case "tar" =>
        val es = Tar.entries(inner)
        if (es.isEmpty) Seq(IngestedDoc(id, "tar", "", "", 0L, valid = false))
        else es.map { case (name, content) => doc("tar", name, content) }
      case "avro" =>
        // record format: one row per record, text = the string-typed
        // fields (schema order) joined by newlines
        val recs = graft.multimodal.Avro.records(inner)
        if (recs.isEmpty) Seq(IngestedDoc(id, "avro", "", "", 0L, valid = false))
        else recs.zipWithIndex.map { case (r, i) =>
          val text = r.collect { case s: String => s }.mkString("\n")
          IngestedDoc(id, "avro", i.toString, text, 0L, valid = true)
        }
      case "orc" =>
        // record format: one row per ORC row, text = the string-typed
        // top-level columns (schema order) joined by newlines
        try {
          val info = graft.sources.OrcRead.read(inner)
          val root = info.types.head
          val strCols = root.fieldNames.zip(root.subtypes)
            .filter { case (_, cid) => Set(7, 16, 17)(info.types(cid).kind) }
            .map(_._1)
          if (!info.valid || info.numRows == 0 || root.kind != 12)
            Seq(IngestedDoc(id, "orc", "", "", 0L, valid = false))
          else {
            val cols = strCols.map(c => graft.sources.OrcRead.readColumn(inner, info, c))
            (0 until info.numRows.toInt).map { i =>
              val text = cols.flatMap(_(i)).map(_.toString).mkString("\n")
              IngestedDoc(id, "orc", i.toString, text, 0L, valid = true)
            }
          }
        } catch {
          case _: Exception => Seq(IngestedDoc(id, "orc", "", "", 0L, valid = false))
        }
      case "tfrecord" =>
        // one row per example, text = the bytes-list features (feature
        // order) UTF-8-repaired and joined by newlines
        val exs = graft.multimodal.TfRecord.examples(inner)
        if (exs.isEmpty) Seq(IngestedDoc(id, "tfrecord", "", "", 0L, valid = false))
        else exs.zipWithIndex.map { case (ex, i) =>
          var bad = 0L
          val parts = ex.collect { case (_, graft.multimodal.TfRecord.BytesF(vs)) =>
            vs.map { v =>
              val (t, nBad) = Utf8.decodeReplacing(v)
              bad += nBad
              t
            }.mkString("\n")
          }
          IngestedDoc(id, "tfrecord", i.toString, parts.mkString("\n"), bad, valid = true)
        }
      case _ =>
        if (raw == null || raw.isEmpty) Seq(IngestedDoc(id, "raw", "", "", 0L, valid = false))
        else Seq(doc("raw", "", inner))
    }
  }

  /** The Dataset face: binary archive payloads → per-entry text rows. */
  def extractText(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): Dataset[IngestedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, raw) => extractOne(id, raw) }
  }
}
