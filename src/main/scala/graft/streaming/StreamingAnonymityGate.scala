package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

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
  * Ingestion is a TEXT stream routed through [[graft.sources.Jsonl]]
  * (r15, ADVICE: the schema'd json stream source null-fills malformed
  * lines, so a poison line landed as a (null, null) QI group
  * indistinguishable from legitimately-null fields): a line that
  * fails to parse lands with `parse_ok = false`, its raw bytes kept,
  * and NEVER contributes to any QI group's count. Legitimately-null
  * QI fields in well-formed rows still gate — the group joins are
  * null-safe.
  *
  * batch_no-partitioned dynamic-overwrite sink: at-least-once
  * foreachBatch retries rewrite exactly their own partition.
  */
object StreamingAnonymityGate {

  private val rowSchema =
    StructType.fromDDL("doc_id BIGINT, lang STRING, source STRING, text STRING")

  /** Streaming (raw, parse_ok, doc_id, lang, source, text) rows from
    * JSONL drops — raw text lines parse-quarantined via Jsonl.parse,
    * the D35 shape.
    */
  def readRows(spark: SparkSession, inDir: String): DataFrame =
    graft.sources.Jsonl.parse(
      spark.readStream
        .format("text")
        .option("pathGlobFilter", "*.jsonl")
        .load(inDir)
        .select(col("value").as("line")),
      "line", rowSchema)

  /** The standing reference: QI group sizes of the released corpus
    * (the q206 aggregate without the flag column).
    */
  def reference(released: DataFrame): DataFrame =
    released.groupBy(col("lang"), col("source"),
      expr("CAST(length(text) AS BIGINT) div 100").as("len_bucket"))
      .agg(count(lit(1)).as("ref_n"))

  /** Gate one batch: each WELL-FORMED row's QI group size = released
    * count + the batch's own count for that group; k_ok iff the
    * combined size clears k. Parse-quarantined rows (parse_ok =
    * false) land k_ok = false without touching any group count. A
    * batch without parse_ok/raw columns (the batch-parity kernel) is
    * treated as all-parsed. Shared by the stream and the spec's
    * parity side.
    */
  def gateBatch(batch: DataFrame, ref: DataFrame, k: Long): DataFrame = {
    val b0 = if (batch.columns.contains("parse_ok")) batch
             else batch.withColumn("parse_ok", lit(true))
    val b = if (b0.columns.contains("raw")) b0
            else b0.withColumn("raw", lit(null).cast("string"))
    val good = b.filter(col("parse_ok"))
      .withColumn("len_bucket", expr("CAST(length(text) AS BIGINT) div 100"))
    val batchN = good.groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("_bn"))
    // null-safe group joins: a well-formed row with a null QI field
    // still groups and gates (equality joins would silently drop it)
    val gated = good.alias("g")
      .join(batchN.alias("bn"),
        col("g.lang") <=> col("bn.lang") && col("g.source") <=> col("bn.source") &&
          col("g.len_bucket") <=> col("bn.len_bucket"))
      .join(ref.alias("r"),
        col("g.lang") <=> col("r.lang") && col("g.source") <=> col("r.source") &&
          col("g.len_bucket") <=> col("r.len_bucket"), "left")
      .select(col("g.doc_id").as("doc_id"), col("g.lang").as("lang"),
        col("g.source").as("source"), col("g.len_bucket").as("len_bucket"),
        (coalesce(col("r.ref_n"), lit(0L)) + col("_bn")).as("group_n"),
        (coalesce(col("r.ref_n"), lit(0L)) + col("_bn") >= k).as("k_ok"),
        lit(true).as("parse_ok"), col("g.raw").as("raw"))
    val poisoned = b.filter(!col("parse_ok"))
      .select(col("doc_id"), col("lang"), col("source"),
        lit(null).cast("long").as("len_bucket"),
        lit(null).cast("long").as("group_n"),
        lit(false).as("k_ok"), lit(false).as("parse_ok"), col("raw"))
    gated.unionByName(poisoned)
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

  /** Read the gate's sink. SINK SCHEMA v2 (r15 added parse_ok/raw):
    * a directory written partly by the v1 schema holds mixed-schema
    * batch_no partitions after an upgrade replay (dynamic overwrite
    * rewrites only replayed partitions), and a plain parquet read
    * resolves ONE footer's schema — silently dropping the new columns
    * or the old rows' view of them. mergeSchema unions the footers;
    * v1 rows surface parse_ok/raw as NULL (they predate quarantining,
    * so "unknown" is the honest value).
    */
  def readSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(outDir)

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
