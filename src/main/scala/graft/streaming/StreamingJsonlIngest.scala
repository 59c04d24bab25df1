package graft.streaming

import graft.sources.Jsonl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** D35 — streaming JSONL ingest under the quarantine-not-drop
  * contract (the C107/q199 kernel, in flight): JSONL files dropped by
  * upstream producers are parsed per micro-batch through
  * [[Jsonl.parse]] — good lines land typed, malformed lines land in
  * the SAME sink flagged `parse_ok = false` with their raw bytes, so
  * a poison line in a continuous feed neither kills the stream
  * (FAILFAST) nor vanishes (DROPMALFORMED). The lines are read as a
  * TEXT stream, not Spark's schema'd json source — the json source
  * null-fills malformed rows indistinguishably from legitimately-null
  * fields, which silently destroys the quarantine signal.
  *
  * Exactly-once the D8 way: the sink is batch_no-partitioned with
  * dynamic partition overwrite, so an at-least-once foreachBatch
  * retry rewrites exactly its own partition byte-identically.
  */
object StreamingJsonlIngest {

  /** Streaming raw lines from JSONL files dropped under `inDir`. */
  def readLines(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("pathGlobFilter", "*.jsonl")
      .load(inDir)
      .select(col("value").as("line"))

  /** One ingest step; public for the spec. */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
                                 schema: StructType, outDir: String): Unit = {
    if (batch.isEmpty) return
    Jsonl.parse(batch, "line", schema)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, schema: StructType,
            outDir: String, checkpointDir: String): StreamingQuery =
    readLines(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, schema, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
