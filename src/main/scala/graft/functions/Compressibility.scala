package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEFLATE compressibility — the zlib-ratio quality signal the
  * published curation recipes gate on (Gopher's and RefinedWeb's
  * repetition family, Dolma's per-doc zlib field): highly
  * compressible text is boilerplate/template/repetition, nearly
  * incompressible "text" is usually binary junk or encoded data;
  * natural prose sits in a band between. Complements q58's explicit
  * repetition counters with a single model-free scalar that catches
  * long-range template structure n-gram counters miss.
  *
  * Deterministic by construction: DEFLATE level 6 with the JDK's own
  * deflater over UTF-8 bytes — same input, same bytes, every
  * partition, every run (spec-pinned against a direct driver-side
  * java.util.zip call and across repartitions). NOT oracle-eligible
  * by design: no SQL engine exposes deflate, so q97 is a declared
  * rows-only driver query — the exactness evidence lives in the spec
  * (the q23/q25 class).
  *
  * Scale shape: map-only — one Deflater per partition, reset per
  * document (allocation-free steady state), no join, no shuffle.
  */
object Compressibility {

  /** Deflate one document; the deflater is caller-owned so a
    * partition reuses a single native buffer via reset().
    */
  private[functions] def deflatedLen(d: java.util.zip.Deflater, bytes: Array[Byte]): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  /** Per-document signal: raw UTF-8 byte count, deflated byte count,
    * and the ratio in exact per-mille (deflated·1000 DIV raw; 0 for
    * empty docs) — integer so downstream gates are engine-portable.
    */
  def signal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        it.map { case (id, text) =>
          val bytes = (if (text == null) "" else text)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val deflated = deflatedLen(d, bytes)
          val permille = if (bytes.length == 0) 0L
            else deflated * 1000L / bytes.length
          (id, bytes.length.toLong, deflated, permille)
        }
      }.toDF(idCol, "raw_bytes", "deflate_bytes", "ratio_permille")
  }
}
