package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D14 — LIVE MATERIALIZED VIEW maintenance: the CDC change feed
  * (StreamingCdc's file stream) maintains BOTH the keyed snapshot
  * (D10's copy-on-write merge loop) and a downstream grouped
  * count/sum aggregate view — the view advanced per micro-batch with
  * `IncrementalAgg.applyDelta` from delta-sized work, NEVER by
  * re-aggregating the snapshot. This is the streaming face of q85:
  * the delta for a batch is (retract the pre-batch rows of every
  * changed key) ∪ (insert the batch's surviving rows), which is
  * exactly the delete+insert encoding `applyDelta` consumes.
  *
  * Both directories use the same versioned copy-on-write layout
  * (`batch_no` partitions + `_COMMITTED_<n>` markers, D10): a
  * micro-batch retry reads only COMMITTED versions strictly below
  * its own id for both states, so at-least-once foreachBatch stays
  * effectively exactly-once even when a crash lands between the
  * snapshot write and the view write (the retry recomputes both from
  * the pre-batch versions and rewrites its own partitions). View
  * versions double as time travel — `viewAt(n)` is the aggregate the
  * outside world saw after batch n — and `StreamingCdc.vacuum`
  * bounds both histories.
  *
  * Scale shape, per micro-batch: the view side costs one delta-sized
  * shuffle (changed keys only — retraction rows come from a semi-join
  * of snapshot × changed keys) plus a view-sized full-outer join;
  * the snapshot side is D10's merge. The view is typically orders of
  * magnitude smaller than the snapshot (one row per group), which is
  * the entire point: the aggregate the dashboard reads never pays a
  * snapshot scan.
  */
object StreamingMaterializedView {

  /** Seed both states: the batch_no=-1 snapshot and its aggregate. */
  def init(base: DataFrame, snapDir: String, viewDir: String,
           groupKeys: Seq[String], sumCols: Seq[String]): Unit = {
    StreamingCdc.initSnapshot(base, snapDir)
    IncrementalAgg.init(base, groupKeys, sumCols)
      .withColumn("batch_no", lit(-1L))
      .write.partitionBy("batch_no").parquet(viewDir)
    StreamingCdc.markCommitted(base.sparkSession, viewDir, -1L)
  }

  /** One micro-batch: advance the snapshot (D10 merge) and the view
    * (incremental delta-apply). Public for the spec's retry
    * assertion.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                                snapDir: String, viewDir: String,
                                groupKeys: Seq[String], sumCols: Seq[String]): Unit = {
    if (batch.isEmpty) return
    // pre-batch states: latest COMMITTED versions strictly below this
    // batch — a retry must not see its own failed attempt's writes
    val snapNo = StreamingCdc.committedBatches(spark, snapDir).filter(_ < batchId).max
    val current = spark.read.parquet(snapDir)
      .filter(col("batch_no") === snapNo).drop("batch_no")
    val viewNo = StreamingCdc.committedBatches(spark, viewDir).filter(_ < batchId).max
    val view = spark.read.parquet(viewDir)
      .filter(col("batch_no") === viewNo).drop("batch_no")

    // within-batch last-writer-wins on the change sequence (the same
    // contract as D10's merge)
    val byKey = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    val newest = batch.withColumn("_rn", row_number().over(byKey))
      .filter(col("_rn") === 1).drop("_rn", "seq")

    // the view delta: retract the pre-batch row of every touched key
    // (update and delete alike — an update re-inserts its new form),
    // insert the batch's surviving rows. A delete of an absent key
    // contributes nothing to either side.
    val retract = current
      .join(newest.select("k"), Seq("k"), "left_semi")
      .withColumn("_op", lit("delete"))
    // null _delete is falsy, mirroring Upsert.merge's `&& deleteCol`
    val insert = newest.filter(!coalesce(col("_delete"), lit(false))).drop("_delete")
      .withColumn("_op", lit("insert"))
    val newView = IncrementalAgg.applyDelta(
      view, retract.unionByName(insert), groupKeys, sumCols)

    // snapshot first, then view — order is immaterial for retries
    // (both reads are pinned to committed < batchId) but keeps D10's
    // external contract: a committed snapshot never lags its view
    StreamingCdc.applyBatch(spark, batch, batchId, snapDir)
    newView.withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(viewDir)
    StreamingCdc.markCommitted(spark, viewDir, batchId)
  }

  /** Wire the loop: AvailableNow drains pending change files, the
    * checkpoint gives each file to exactly one micro-batch.
    */
  def start(spark: SparkSession, inDir: String, snapDir: String, viewDir: String,
            checkpointDir: String, groupKeys: Seq[String],
            sumCols: Seq[String]): StreamingQuery =
    StreamingCdc.readChanges(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, snapDir, viewDir, groupKeys, sumCols)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The current view: highest COMMITTED version. */
  def view(spark: SparkSession, viewDir: String): DataFrame = {
    val committed = StreamingCdc.committedBatches(spark, viewDir)
    require(committed.nonEmpty, s"no committed view in $viewDir")
    spark.read.parquet(viewDir)
      .filter(col("batch_no") === committed.max).drop("batch_no")
  }

  /** TIME TRAVEL: the view as of committed batch `n`. */
  def viewAt(spark: SparkSession, viewDir: String, n: Long): DataFrame = {
    require(StreamingCdc.committedBatches(spark, viewDir).contains(n),
      s"batch $n is not a committed, retained view version in $viewDir")
    spark.read.parquet(viewDir).filter(col("batch_no") === n).drop("batch_no")
  }
}
