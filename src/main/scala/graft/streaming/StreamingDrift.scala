package graft.streaming

import graft.functions.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D29 — streaming DISTRIBUTION-DRIFT monitor: each arriving
  * micro-batch's signal distribution (document length, quality score,
  * token count…) is KS-tested against a STATIC reference
  * distribution (the accepted corpus / last week's snapshot), and one
  * verdict row per batch lands in the monitor sink — the in-flight
  * shape of q168/C84, closing the same loop D9 closes for
  * contamination and D28 for LM quality: a crawl whose length or
  * quality profile has shifted is flagged BEFORE it lands, not
  * discovered in next month's training run.
  *
  * Per micro-batch: `Stats.ksTest` over (reference ∪ delta) with
  * membership as the group flag — the reference side re-aggregates
  * per batch at per-distinct-value scale (the caller passes the
  * PRE-AGGREGATED reference (value, weight) table, so the raw
  * reference corpus is never rescanned). The alarm is a pure
  * threshold on the exact statistic: D ≥ dAlarm flags the batch.
  * batch_no-partitioned dynamic-overwrite sink — the D8/D9
  * effective-exactly-once contract under foreachBatch retries.
  */
object StreamingDrift {

  /** Streaming (doc_id, text) from JSONL files dropped under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** Pre-aggregate a reference corpus signal to the (value, n) table
    * the per-batch test unions against. Call once, persist or land as
    * a table.
    */
  def referenceCounts(reference: DataFrame, value: org.apache.spark.sql.Column): DataFrame =
    reference.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))

  /** One monitoring step; public for the spec. The batch signal is
    * `length(text)` — the crawl monitor's canonical first signal.
    */
  private[graft] def testBatch(batch: DataFrame, batchId: Long, refCounts: DataFrame,
                               monitorDir: String, dAlarm: Double): Unit = {
    if (batch.isEmpty) return
    // both sides at (value, count) granularity: the reference is
    // already aggregated, the delta aggregates here — the weighted
    // ksTestCounts core never sees row-level data.
    val b = batch.select(length(col("text")).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
    val unioned =
      refCounts.select(col("v"), col("n"), lit(true).as("ia"))
        .unionByName(b.select(col("v"), col("n"), lit(false).as("ia")))
    val verdict = Stats.ksTestCounts(unioned, col("v"), col("n"), col("ia"))
      .withColumn("drifted", col("d").isNotNull && col("d") >= dAlarm)
      .withColumn("batch_no", lit(batchId))
    verdict.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(monitorDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, refCounts: DataFrame,
            monitorDir: String, checkpointDir: String,
            dAlarm: Double = 0.2): StreamingQuery =
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        testBatch(batch, batchId, refCounts, monitorDir, dAlarm)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- D32: the CATEGORICAL arm (chi-square, q180/C92 core) --------
  // KS above monitors an ORDERED signal's shape; the language/source
  // MIX of an arriving batch is unordered — its drift test is the
  // exact chi-square of homogeneity against the same kind of standing
  // pre-aggregated reference.

  /** Pre-aggregate a reference corpus category to the (c, n) table
    * each batch tests against. Call once, persist or land as a table.
    */
  def referenceCategoryCounts(reference: DataFrame,
                              category: org.apache.spark.sql.Column): DataFrame =
    reference.select(category.cast("string").as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))

  /** One categorical monitoring step; public for the spec. `category`
    * derives the batch rows' category from the (doc_id, text) schema.
    */
  private[graft] def testBatchCategorical(batch: DataFrame, batchId: Long,
                                          refCounts: DataFrame, monitorDir: String,
                                          chi2Alarm: Double,
                                          category: org.apache.spark.sql.Column): Unit = {
    if (batch.isEmpty) return
    val b = batch.select(category.cast("string").as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
    val unioned =
      refCounts.select(col("c"), col("n"), lit(true).as("ia"))
        .unionByName(b.select(col("c"), col("n"), lit(false).as("ia")))
    val verdict = Stats.chiSquareCounts(unioned, col("c"), col("n"), col("ia"))
      .withColumn("drifted", col("chi2").isNotNull && col("chi2") >= chi2Alarm)
      .withColumn("batch_no", lit(batchId))
    verdict.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(monitorDir)
  }

  /** Wire the categorical monitor (same exactly-once sink contract as
    * [[start]]).
    */
  def startCategorical(spark: SparkSession, inDir: String, refCounts: DataFrame,
                       monitorDir: String, checkpointDir: String,
                       category: org.apache.spark.sql.Column,
                       chi2Alarm: Double = 30.0): StreamingQuery =
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        testBatchCategorical(batch, batchId, refCounts, monitorDir, chi2Alarm, category)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
