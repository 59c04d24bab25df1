package graft.streaming

import graft.functions.PortableBloom
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D9 — streaming DECONTAMINATION: documents arriving on a file
  * stream are checked per micro-batch against a STATIC benchmark
  * bloom filter (built once in batch with `PortableBloom.build` from
  * the held-out/benchmark gram set) and written as per-doc verdicts.
  * This is the in-flight shape of q67's batch check — incoming crawl
  * data is flagged before it ever lands in the training corpus,
  * instead of decontaminating the corpus after the fact.
  *
  * The filter side is static and broadcast (integer positions — the
  * relational bit array); per-micro-batch work is one tokenize +
  * membership pass over the delta only. The verdict sink is
  * batch_no-partitioned with dynamic overwrite, so foreachBatch's
  * at-least-once retries rewrite exactly their own partition —
  * effective exactly-once, same contract as StreamingIngest (D8).
  */
object StreamingDecontaminate {

  /** Streaming (doc_id, text) from JSONL files dropped under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** One decontamination step; public for the spec. */
  private[graft] def flagBatch(batch: DataFrame, batchId: Long, bloom: DataFrame,
                               verdictDir: String, k: Int, m: Int, gramN: Int): Unit = {
    if (batch.isEmpty) return
    PortableBloom.decontaminate(batch, "doc_id", "text", bloom, k, m, gramN)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(verdictDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, bloom: DataFrame,
            verdictDir: String, checkpointDir: String,
            k: Int = 3, m: Int = 1 << 20, gramN: Int = 8): StreamingQuery =
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        flagBatch(batch, batchId, bloom, verdictDir, k, m, gramN)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
