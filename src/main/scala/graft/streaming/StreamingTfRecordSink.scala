package graft.streaming

import graft.multimodal.TfRecord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D25 — TRAINING-DATA DELIVERY as a stream: curated documents flow
  * out as sharded TFRECORD files (q137's format — what the training
  * job actually reads) plus a parquet MANIFEST row per shard
  * (batch, shard path, record count, byte size). This closes the
  * pipeline end to end in streaming form: D24 ingests archives,
  * the corpus stages curate, D25 delivers model-ready shards.
  *
  * Exactly-once the D8 way: shard FILE NAMES are deterministic in
  * (batch, partition) and simply overwritten on a foreachBatch
  * retry, and the manifest is partitioned by `batch_no` and written
  * with DYNAMIC partition overwrite — a retried batch rewrites
  * exactly its own shards and its own manifest partition, so
  * at-least-once retries converge to the same bytes on disk.
  *
  * Scale: each executor partition writes its own shard —
  * embarrassingly parallel, no shuffle beyond the explicit
  * `shards`-way repartition that controls output file size, the
  * knob a 100 TB delivery tunes (shards ∝ corpus / target shard
  * size). TFRecord's per-record CRCs mean a corrupted shard is
  * detected at TRAINING time too, not just here.
  */
object StreamingTfRecordSink {

  final case class CuratedDoc(doc_id: Long, text: String)
  final case class ShardManifest(batch_no: Long, shard: String, n_records: Long, n_bytes: Long)

  /** Write one TFRecord shard per partition per batch; returns the
    * manifest rows. Deterministic shard names make retries idempotent.
    */
  /** Also the BATCH delivery face — one-shot corpus exports call it
    * directly with a fixed batch id.
    */
  private[graft] def writeShards(docs: Dataset[CuratedDoc], batchId: Long,
                                 outDir: String, shards: Int): Seq[ShardManifest] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.repartition(shards, col("doc_id"))
      .mapPartitions { it =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toVector.sortBy(_.doc_id) // deterministic within shard
        if (rows.isEmpty) Iterator.empty
        else {
          val examples: Seq[TfRecord.Example] = rows.map { d =>
            Vector(
              "id" -> TfRecord.Int64F(Vector(d.doc_id)),
              "text" -> TfRecord.BytesF(Vector(d.text.getBytes("UTF-8"))))
          }
          val bytes = TfRecord.encodeFile(examples)
          val name = f"part-$batchId%05d-$part%05d.tfrecord"
          val dir = java.nio.file.Paths.get(outDir)
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.write(dir.resolve(name), bytes)
          Iterator.single(ShardManifest(batchId, name, rows.size.toLong, bytes.length.toLong))
        }
      }.collect().toSeq
  }

  /** Start the delivery stream: docs → TFRecord shards under
    * `shardDir` + manifest parquet under `manifestDir`.
    */
  def start(docs: DataFrame, shardDir: String, manifestDir: String,
            checkpointDir: String, shards: Int = 4): StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs.select(col("doc_id").cast("long"), col("text")).as[CuratedDoc]
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[CuratedDoc], batchId: Long) =>
        val manifest = writeShards(batch, batchId, shardDir, shards)
        if (manifest.nonEmpty) {
          manifest.toDF()
            .write.mode("overwrite")
            .partitionBy("batch_no")
            .parquet(manifestDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Read every delivered shard back through the TFRecord decoder
    * (both CRCs verified per record) — the training job's view.
    */
  def readBack(spark: SparkSession, shardDir: String): Seq[(Long, String)] = {
    val dir = java.nio.file.Paths.get(shardDir)
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val files = java.nio.file.Files.list(dir).iterator()
    val out = Vector.newBuilder[(Long, String)]
    while (files.hasNext) {
      val f = files.next()
      if (f.getFileName.toString.endsWith(".tfrecord")) {
        TfRecord.examples(java.nio.file.Files.readAllBytes(f)).foreach { ex =>
          val m = ex.toMap
          out += ((m("id").asInstanceOf[TfRecord.Int64F].values.head,
            new String(m("text").asInstanceOf[TfRecord.BytesF].values.head, "UTF-8")))
        }
      }
    }
    out.result()
  }
}
