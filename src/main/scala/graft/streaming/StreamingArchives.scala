package graft.streaming

import graft.etl.Ingest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D24 — the archive-ingestion front door (q135's `etl.Ingest`) as a
  * stream: crawl archives landing continuously (WARC / ZIP / tar,
  * plain or gzipped, routed by CONTENT) fan out to per-entry text
  * rows with UTF-8 repair counts and visible invalid markers — the
  * same rows the batch path produces, because the kernel IS the
  * batch kernel: `Ingest.extractText` is a stateless flatMap, so the
  * streaming face needs no state store, no watermark, and inherits
  * exactly-once from the file source + append sink pair (offsets in
  * the checkpoint, output committed per batch). Stream ≡ batch is
  * spec-pinned row-for-row.
  *
  * Payloads arrive base64-encoded in JSONL (the transport shape a
  * Kafka value or landing file actually has); `fromBase64Json`
  * decodes to binary before the sniff. Scale: per-batch work is
  * map-only fan-out ∝ entries — the q135 plan, continuously.
  */
object StreamingArchives {

  /** Streaming (archive_id, payload) from JSONL files with base64
    * payloads dropped under `inDir`.
    */
  def fromBase64Json(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("archive_id BIGINT, payload_b64 STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)
      .select(col("archive_id").as("doc_id"), unbase64(col("payload_b64")).as("payload"))

  /** The stateless extraction — identical to the batch face. */
  def extract(payloads: DataFrame): Dataset[Ingest.IngestedDoc] =
    Ingest.extractText(payloads)

  /** Append per-entry rows to a parquet table. */
  def start(payloads: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    extract(payloads).toDF()
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
