package graft.streaming

import graft.functions.Blocklist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D15 — streaming BLOCKLIST screening: documents arriving on a file
  * stream are scanned per micro-batch by q93's Aho-Corasick automaton
  * and written as per-doc verdicts — the in-flight shape of the batch
  * content filter, so banned-phrase / policy / contamination-probe
  * hits are flagged before a crawl document ever lands in the corpus.
  *
  * The operator is STATELESS (each doc's verdict depends on nothing
  * but the doc), so no state store is involved: the automaton is
  * driver-built once and rides the task closure into every
  * micro-batch — map-only per batch, the q93 scale contract. The
  * sink is Spark's transactional file sink (its commit log gives
  * end-to-end exactly-once for a deterministic stateless transform
  * over the exactly-once file source — no foreachBatch bookkeeping
  * needed, unlike D8/D10's stateful merges).
  */
object StreamingBlocklist {

  /** Streaming (doc_id, text) from JSONL files dropped under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** The screening transform — shared verbatim with the batch twin
    * (Blocklist.annotate works unchanged on a streaming DataFrame
    * because it is a stateless mapPartitions).
    */
  def screened(docs: DataFrame, patterns: Seq[String] = Blocklist.defaultPatterns): DataFrame =
    Blocklist.annotate(docs, "doc_id", "text", patterns)

  /** Wire the stream: AvailableNow drains pending files and stops;
    * checkpoint + file-sink commit log make each input file's
    * verdicts land exactly once across restarts.
    */
  def start(spark: SparkSession, inDir: String, verdictDir: String,
            checkpointDir: String,
            patterns: Seq[String] = Blocklist.defaultPatterns): StreamingQuery =
    screened(readDocs(spark, inDir), patterns).writeStream
      .format("parquet")
      .option("path", verdictDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
