package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D34 — streaming ROBUST OUTLIER GATE: arriving rows are flagged
  * against a STANDING per-group median/MAD table (the q187/B54 core:
  * |x − median| > k·MAD, all-integer) — the deployment shape of
  * robust outlier detection: the reference statistics train ONCE in
  * batch on the accepted corpus (`Stats.madOutliers` provides them),
  * each micro-batch is gated row-by-row map-side against the
  * broadcast-sized reference, and every row LANDS with its verdict
  * (quarantine-not-drop, the D8 contract) so flagged rows stay
  * auditable. The robust statistics matter precisely here: a batch
  * full of spikes cannot drag the gate the way it drags a streaming
  * mean/σ (the D16 z-test monitor's known blind spot, spec-pinned on
  * the batch side).
  *
  * batch_no-partitioned dynamic-overwrite sink — at-least-once
  * foreachBatch retries rewrite exactly their own partition (the
  * D8/D9 effective-exactly-once contract). Rows whose group has no
  * reference entry flag as `unknown_group` rather than passing
  * silently.
  */
object StreamingRobustGate {

  /** Streaming (doc_id, grp, value) from JSONL files under `inDir`. */
  def readRows(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, grp STRING, value BIGINT")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** Gate one batch against the standing (grp, median, mad) table;
    * shared by the stream and the spec's batch-parity side.
    */
  def gateBatch(batch: DataFrame, reference: DataFrame, k: Int): DataFrame = {
    val ref = reference.select(col("grp"), col("median"), col("mad"))
    batch.join(ref, Seq("grp"), "left")
      .select(col("doc_id"), col("grp"), col("value"),
        col("median"), col("mad"),
        col("median").isNull.as("unknown_group"),
        (col("median").isNotNull &&
          abs(col("value") - col("median")) > lit(k.toLong) * col("mad"))
          .as("outlier"))
  }

  /** One gating step; public for the spec. */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long, reference: DataFrame,
                                 outDir: String, k: Int): Unit = {
    if (batch.isEmpty) return
    gateBatch(batch, reference, k)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, reference: DataFrame,
            outDir: String, checkpointDir: String, k: Int = 3): StreamingQuery =
    readRows(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, reference, outDir, k)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
