package graft.streaming

import graft.similarity.ProductQuantizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D41 — STREAMING EMBED-AND-INDEX (r16): the full crawl front door
  * for the vector tier — raw TEXT documents arrive, embed
  * deterministically on-engine (the C121/q214 hashing-trick
  * projection, no external model), and the served PQ index follows
  * via the D38 maintenance step. Text in, servable ANN index out,
  * every stage deterministic:
  *
  *   JSONL text drop → HashedEmbedding.embed (map-side integers)
  *     → StreamingIndexMaintain.maintainBatch (frozen-codebook
  *       append, (cid, batch_no) exactly-once leaves, occupancy
  *       retrain gate)
  *
  * Because both the embedding and the encode are pure functions of
  * the text, the maintained index is row-identical to a batch
  * rebuild over all text seen so far — the spec's pin, end to end
  * from raw text. Per tick: embed is one explode + two keyed
  * aggregates over the batch; everything downstream is D38's
  * batch-scale contract.
  */
object StreamingEmbedIngest {

  val Dim = 64

  /** Streaming (doc_id, text) from JSONL files under `inDir`. */
  def readDocs(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** The batch-equivalent embed kernel: (vec_id, embedding
    * array<float>) from text — q214's integer projection, cast to
    * the float vector shape the PQ tier consumes (values are small
    * integers, so the cast is exact).
    */
  def embedBatch(docs: DataFrame): DataFrame =
    graft.functions.HashedEmbedding.embed(docs, "doc_id", "text", Dim)
      .select(col("doc_id").as("vec_id"),
        transform(col("embedding"), v => v.cast("float")).as("embedding"))

  /** Wire the stream: embed, then hand to the D38 maintenance step.
    * AvailableNow drains pending files and stops; the checkpoint
    * makes each file processed exactly once across restarts.
    */
  def start(spark: SparkSession, inDir: String, model: ProductQuantizer.Model,
            indexDir: String, monitorDir: String, checkpointDir: String,
            refOccupancy: DataFrame, buckets: Int = 8,
            chi2Alarm: Double = 30.0): StreamingQuery =
    readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingIndexMaintain.maintainBatch(embedBatch(batch), batchId,
          model, buckets, indexDir, monitorDir, refOccupancy, chi2Alarm)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
