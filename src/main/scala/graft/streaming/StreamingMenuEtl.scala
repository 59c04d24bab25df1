package graft.streaming

import graft.etl.{MenuParser, MenuValidator, TextNormalizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming twin of MenuPipeline: watch a directory for new menu
  * text files, run normalize -> split -> parse -> validate on each
  * micro-batch, and append valid items to a parquet sink (the
  * reference's Dagster job re-runs the folder scan from scratch every
  * invocation; a file-source stream processes each file exactly once
  * with checkpointed progress).
  */
object StreamingMenuEtl {

  /** Streaming (doc_id, source, text) from new files under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.txt")
      .load(inDir)
      .select(
        abs(xxhash64(col("_metadata.file_path"))).as("doc_id"),
        regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("source"),
        col("value").as("text"))

  /** The per-batch transformation — same semantics as the batch
    * pipeline, but sections are propagated inside the per-doc line
    * array (MenuParser.sectionedLines) because the batch path's
    * running-last window is unsupported on streaming frames.
    */
  def parseItems(docs: DataFrame): DataFrame =
    MenuValidator.validate(
      MenuParser.parseFields(MenuParser.sectionedLines(docs)))
      .filter(col("is_valid"))
      .drop("is_valid", "reject_reason")

  /** Wire the stream to a parquet sink with checkpointing. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String): StreamingQuery =
    parseItems(readDocs(spark, inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
