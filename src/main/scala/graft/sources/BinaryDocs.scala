package graft.sources

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus ingestion — the distributed twin of the reference's
  * input-folder walk (process_menu.py:120 / menu_assets.py:32 iterate a
  * directory one file at a time; here `binaryFile` lists and reads
  * the tree in parallel across executors).
  *
  * The output shape matches the reference's extraction record:
  * (doc_id, source, path, extractor, payload), ready for
  * Multimodal.decodeMeta (stub OCR/PDF decode) or, for text files,
  * direct decoding into MenuPipeline.
  */
object BinaryDocs {

  /** Read every file under `dir` (recursively) as an opaque binary
    * payload with metadata. pathGlobFilter mirrors the reference's
    * supported-extension routing.
    */
  def read(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        abs(xxhash64(col("path"))).as("doc_id"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("source"),
        col("path"),
        col("length").as("byte_size"),
        Multimodal.routeByExtension("path").as("extractor"),
        col("content").as("payload"))

  /** Text-decode payloads (UTF-8) into the (doc_id, source, text)
    * shape MenuPipeline.run consumes. Non-text media stays in
    * `payload` for the multimodal path.
    */
  def asText(docs: DataFrame): DataFrame =
    docs.withColumn("text", col("payload").cast("string"))
      .select(col("doc_id"), col("source"), col("text"))
}
