package graft.streaming

import graft.functions.Perceptron
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D42 — STREAMING TRAINED-CLASSIFIER GATE (r17): the deployment
  * shape of q72's persisted-model scoring, completing the trained
  * tier's production loop (train once → persist → batch curation
  * scores it → and now the CRAWL FRONT DOOR scores it too). The
  * batch perceptron trains once on a labeled slice (q212's tier),
  * [[Perceptron.save]] persists the model-sized weight table, and
  * the gate LOADS it at stream start; documents arriving on a file
  * stream score per micro-batch — hashed features explode over the
  * DELTA only, one broadcast join against the ≤`buckets`-row weight
  * table, one per-doc aggregate — and land as (doc_id, margin, keep)
  * verdicts BEFORE the doc can enter a training corpus (the D9/D28
  * in-flight-vs-after contract).
  *
  * The verdict sink is batch_no-partitioned with dynamic overwrite,
  * so foreachBatch's at-least-once retries rewrite exactly their own
  * partition — effective exactly-once, the D8/D9 discipline. The
  * model stays FROZEN across ticks; like D38's occupancy test, the
  * gate monitors its own routing statistic for staleness: each batch
  * lands a monitor row with the batch's kept fraction against the
  * reference (training-corpus) kept fraction, and a `retrain_gate`
  * verdict fires when the absolute drift exceeds the alarm — a crawl
  * whose keep rate collapses (or saturates) is scoring a
  * distribution the frozen weights never saw.
  *
  * Per-tick cost: map-only over the batch plus one model-sized
  * broadcast; the monitor is one two-value aggregate. Nothing
  * corpus-sized is read or shuffled at any tick.
  */
object StreamingClassifierGate {

  /** Streaming (doc_id, text) from JSONL files dropped under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** One scoring step; public for the spec. */
  private[graft] def scoreBatch(batch: DataFrame, batchId: Long,
                                model: Perceptron.Model,
                                verdictDir: String, monitorDir: String,
                                refKeptFrac: Double, driftAlarm: Double): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val verdicts = batch.select(col("doc_id"))
      .join(Perceptron.score(batch, "doc_id", "text", model), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("margin"), lit(0L)).as("margin"),
        (coalesce(col("margin"), lit(0L)) > 0L).as("keep"))
    verdicts.withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(verdictDir)
    // staleness monitor: the batch's keep rate vs the training
    // corpus's — collected driver-side (two longs) so an all-drop or
    // empty-margin batch writes exact zeros, never NULLs (the D40
    // empty-reverse-edge lesson)
    val st = verdicts.agg(count(lit(1)).as("n"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("k")).collect().head
    val n = st.getAs[Long]("n")
    val k = st.getAs[Long]("k")
    val frac = if (n == 0L) 0.0 else k.toDouble / n.toDouble
    import spark.implicits._
    Seq((n, k, frac, refKeptFrac, math.abs(frac - refKeptFrac) > driftAlarm, batchId))
      .toDF("n_docs", "n_kept", "kept_frac", "ref_kept_frac", "retrain_gate", "batch_no")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(monitorDir)
  }

  /** Wire the stream: the model loads from its persisted directory
    * ONCE (rides the closure — model-sized), AvailableNow drains
    * pending files and stops, and the checkpoint makes each file
    * processed exactly once across restarts.
    */
  def start(spark: SparkSession, inDir: String, modelDir: String,
            verdictDir: String, monitorDir: String, checkpointDir: String,
            refKeptFrac: Double, driftAlarm: Double = 0.5): StreamingQuery = {
    val model = Perceptron.load(spark, modelDir)
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(batch, batchId, model, verdictDir, monitorDir,
          refKeptFrac, driftAlarm)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
