package graft.streaming

import graft.dedup.MinHashLsh
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D30 — streaming NEAR-DUPLICATE gate: arriving documents are
  * MinHash-banded and checked against a STANDING signature index (the
  * accepted corpus), one verdict row per detected near-dup per batch —
  * the in-flight shape of the q25/q43 dedup tier, closing the same
  * loop D9 closes for exact contamination: a crawl batch that
  * near-duplicates already-held documents is flagged (and can be
  * dropped) BEFORE it lands, instead of being found by the next full
  * corpus dedup run.
  *
  * The index is built ONCE from the accepted corpus
  * (`MinHashLsh.signatures` → persist/land as a table): per doc, the
  * 32-hash signature's band hashes plus the hashed-shingle bases the
  * verification tier scores against. Per micro-batch the arriving
  * docs compute their own signatures (map-scale, batch-sized), join
  * the band table on (band_idx, band_hash) — a keyed join against
  * bounded buckets, never corpus × batch — and candidates verify with
  * the same exact-Jaccard expression the batch tier uses. At 100 TB
  * the index is corpus-scale but the per-tick cost is
  * batch × collisions; skew-prone buckets should be capped at index
  * BUILD time (the `maxBucketSize` guard in `pairsFromBanded`), the
  * gate joins whatever the caller indexed.
  *
  * batch_no-partitioned dynamic-overwrite sink — the D8/D9
  * effective-exactly-once contract under foreachBatch retries.
  */
object StreamingNearDup {

  /** Streaming (doc_id, text) from JSONL files dropped under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** Build the standing index from the accepted corpus: one row per
    * (doc_id, band_idx, band_hash) with the verification bases
    * carried alongside. Persist or land this once; the gate only
    * reads it.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 cfg: MinHashLsh.Config = MinHashLsh.Config()): DataFrame = {
    val sigs = MinHashLsh.signatures(corpus, idCol, textCol, cfg)
    MinHashLsh.banded(sigs, idCol, cfg)
      .join(sigs.select(col(idCol), col("_bases")), Seq(idCol))
      .select(col(idCol).as("index_id"), col("band_idx"), col("band_hash"),
        col("_bases").as("index_bases"))
  }

  /** One gate step; public for the spec. Emits (doc_id, dup_of,
    * jaccard, batch_no) for every (batch doc, index doc) pair whose
    * exact Jaccard reaches `threshold`.
    */
  private[graft] def gateBatch(batch: DataFrame, batchId: Long, index: DataFrame,
                               outDir: String, threshold: Double,
                               cfg: MinHashLsh.Config): Unit = {
    if (batch.isEmpty) return
    verdicts(batch, index, threshold, cfg)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** The batch-equivalent core (what the spec pins the stream
    * against): band-join the docs against the index, verify
    * candidates with the exact-Jaccard expression of the batch tier.
    */
  def verdicts(docs: DataFrame, index: DataFrame, threshold: Double,
               cfg: MinHashLsh.Config = MinHashLsh.Config()): DataFrame = {
    graft.functions.ShingleFunctions.register(docs.sparkSession)
    val sigs = MinHashLsh.signatures(docs, "doc_id", "text", cfg)
    val bands = MinHashLsh.banded(sigs, "doc_id", cfg)
    val cand = bands.join(index, Seq("band_idx", "band_hash"))
      .filter(col("doc_id") =!= col("index_id"))
      .select(col("doc_id"), col("index_id"), col("index_bases"))
      .distinct()
    cand.join(sigs.select(col("doc_id"), col("_bases")), Seq("doc_id"))
      .withColumn("jaccard",
        graft.functions.ShingleFunctions.sortedJaccard(col("_bases"), col("index_bases")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("index_id").as("dup_of"), col("jaccard"))
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, index: DataFrame,
            outDir: String, checkpointDir: String,
            threshold: Double = 0.8,
            cfg: MinHashLsh.Config = MinHashLsh.Config()): StreamingQuery =
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId, index, outDir, threshold, cfg)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
