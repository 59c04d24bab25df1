package graft.streaming

import graft.similarity.ProductQuantizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D31 — streaming ANN SERVING: arriving query vectors are routed and
  * scored against a STANDING IVFADC index (the q176/C91 composition —
  * coarse buckets prune, PQ codes compress, ADC scores), one top-k
  * result set per query per micro-batch — the in-flight face of the
  * similarity tier, the shape of embedding-based retrieval serving
  * (retrieval-augmented pipelines, online near-dup probes) built from
  * the exact same operators the batch tier runs.
  *
  * The index is built ONCE from the corpus (`buildIndex` = PQ-encode
  * + bucket column; persist or land partitioned BY the bucket, so a
  * probe reads nprobe partitions). Per micro-batch the arriving
  * queries explode to nprobe (query, bucket) probe rows map-side and
  * join the index KEYED on the bucket — per tick the cost is
  * batch × probed buckets' codes, never corpus × batch.
  *
  * batch_no-partitioned dynamic-overwrite sink — the D8/D9
  * effective-exactly-once contract under foreachBatch retries.
  */
object StreamingAnnServe {

  /** Streaming (query_id, embedding) from JSONL files under `inDir`. */
  def readQueries(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("query_id BIGINT, embedding ARRAY<FLOAT>")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** PQ-encode the corpus and attach the deterministic bucket column
    * — the standing index the gate reads (at scale: write partitioned
    * by `cid`).
    */
  def buildIndex(corpus: DataFrame, model: ProductQuantizer.Model,
                 buckets: Int): DataFrame =
    ProductQuantizer.encode(corpus, model)
      .withColumn("cid", pmod(col("vec_id"), lit(buckets)).cast("int"))
      .select("vec_id", "pq_code", "cid")

  /** The batch-equivalent core (what the spec pins the stream
    * against): deterministic probe routing + bucket-keyed ADC top-k.
    */
  def verdicts(queries: DataFrame, index: DataFrame,
               model: ProductQuantizer.Model, buckets: Int, nprobe: Int,
               k: Int): DataFrame = {
    val probes = queries
      .select(col("query_id"), col("embedding").as("_qvec"))
      .withColumn("cid", explode(array((0 until nprobe).map(i =>
        pmod(col("query_id") + i, lit(buckets)).cast("int")): _*)))
    ProductQuantizer.searchProbed(index, model, probes, k)
      .withColumn("rk", col("rank").cast("long")).drop("rank")
      .select(col("query_id"), col("rk"), col("vec_id"), col("adc_dist"))
  }

  private[graft] def serveBatch(batch: DataFrame, batchId: Long, index: DataFrame,
                                model: ProductQuantizer.Model, buckets: Int,
                                nprobe: Int, k: Int, outDir: String): Unit = {
    if (batch.isEmpty) return
    verdicts(batch, index, model, buckets, nprobe, k)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, index: DataFrame,
            model: ProductQuantizer.Model, outDir: String, checkpointDir: String,
            buckets: Int = 8, nprobe: Int = 3, k: Int = 5): StreamingQuery =
    readQueries(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        serveBatch(batch, batchId, index, model, buckets, nprobe, k, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
