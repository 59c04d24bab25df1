package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D36 — streaming k-ANONYMITY GATE: arriving rows are checked
  * against a STANDING quasi-identifier group-size table (the
  * C113/q206 audit, computed once in batch over the released
  * corpus): a row whose QI combination is RARE — group size below
  * k counting the released corpus AND the arriving batch's own
  * contribution — would degrade the release's k-anonymity if
  * landed, so it lands QUARANTINED (`k_ok = false`) instead of
  * silently joining a small group (the D8/D34 quarantine-not-drop
  * discipline; new QI combinations unseen by the release count as
  * size 0 and flag unless the batch itself clears k). Per-tick cost:
  * one batch-side QI aggregate + one join against the
  * bounded-cardinality reference — the corpus is never rescanned.
  *
  * batch_no-partitioned dynamic-overwrite sink: at-least-once
  * foreachBatch retries rewrite exactly their own partition.
  */
object StreamingAnonymityGate {

  /** Streaming (doc_id, lang, source, text) rows from JSONL drops. */
  def readRows(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, lang STRING, source STRING, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** The standing reference: QI group sizes of the released corpus
    * (the q206 aggregate without the flag column).
    */
  def reference(released: DataFrame): DataFrame =
    released.groupBy(col("lang"), col("source"),
      expr("CAST(length(text) AS BIGINT) div 100").as("len_bucket"))
      .agg(count(lit(1)).as("ref_n"))

  /** Gate one batch: each row's QI group size = released count +
    * the batch's own count for that group; k_ok iff the combined
    * size clears k. Shared by the stream and the spec's parity side.
    */
  def gateBatch(batch: DataFrame, ref: DataFrame, k: Long): DataFrame = {
    val withQi = batch.withColumn("len_bucket",
      expr("CAST(length(text) AS BIGINT) div 100"))
    val batchN = withQi.groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("_bn"))
    withQi
      .join(batchN, Seq("lang", "source", "len_bucket"))
      .join(ref, Seq("lang", "source", "len_bucket"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("len_bucket"),
        (coalesce(col("ref_n"), lit(0L)) + col("_bn")).as("group_n"),
        (coalesce(col("ref_n"), lit(0L)) + col("_bn") >= k).as("k_ok"))
  }

  /** One gating step; public for the spec. */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long, ref: DataFrame,
                                 outDir: String, k: Long): Unit = {
    if (batch.isEmpty) return
    gateBatch(batch, ref, k)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, ref: DataFrame,
            outDir: String, checkpointDir: String, k: Long = 5L): StreamingQuery =
    readRows(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, ref, outDir, k)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
