package graft.streaming

import graft.sources.ArrowIpc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D33 — streaming ARROW IPC ingest: Arrow files dropped by upstream
  * tooling (feature stores, dataframe exports — the q182/C94 format)
  * are decoded per micro-batch through graft's own reader and landed
  * as typed rows, the in-flight shape of the q142/D8 record-format
  * ingest: a 100 TB pipeline's feeds arrive as files on object
  * storage, and the ingest tier must pick them up incrementally with
  * exactly-once landing semantics.
  *
  * Per micro-batch: the file-source stream delivers (path, bytes);
  * [[ArrowIpc.decode]] runs INSIDE mapPartitions (map-only, one file
  * per task — the batch q182 kernel unchanged), valid files explode
  * to rows (file path + batch index + row values), invalid payloads
  * land in the same sink flagged `valid = false` with their path (the
  * quarantine-not-drop contract of D8). batch_no-partitioned
  * dynamic-overwrite sink — at-least-once foreachBatch retries
  * rewrite exactly their own partition (the D8/D9 effective-exactly-
  * once contract).
  */
object StreamingArrowIngest {

  /** Streaming (path, content) from Arrow files dropped under `inDir`. */
  def readFiles(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .format("binaryFile")
      // the binaryFile source's fixed schema, required explicitly by
      // the streaming source (no inference on streams)
      .schema("path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
      .option("pathGlobFilter", "*.arrow")
      .load(inDir)
      .select(col("path"), col("content"))

  /** Decode one batch of (path, content) Arrow payloads to rows of
    * the q182 fixture schema (a BIGINT, x DOUBLE, s STRING) plus
    * provenance; shared by the stream and the spec's batch-parity
    * side. Files outside the supported scope yield one
    * valid=false row.
    */
  def decodeBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        ArrowIpc.decode(if (bytes == null) Array.emptyByteArray else bytes) match {
          case Some(f) if f.schema.map(c => (c.name, c.tpe)) ==
              Seq(("a", ArrowIpc.I64), ("x", ArrowIpc.F64), ("s", ArrowIpc.Str)) =>
            f.batches.iterator.zipWithIndex.flatMap { case (b, bi) =>
              (0 until b.nRows).iterator.map { i =>
                (path, bi.toLong, i.toLong,
                  b.cols(0)(i).map(_.asInstanceOf[Long]),
                  b.cols(1)(i).map(_.asInstanceOf[Double]),
                  b.cols(2)(i).map(_.asInstanceOf[String]), true)
              }
            }
          case _ =>
            Iterator((path, -1L, -1L, None: Option[Long], None: Option[Double],
              None: Option[String], false))
        }
      }).toDF("path", "batch_idx", "row_idx", "a", "x", "s", "valid")
  }

  /** One ingest step; public for the spec. */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long, outDir: String): Unit = {
    if (batch.isEmpty) return
    decodeBatch(batch)
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(outDir)
  }

  /** Wire the stream: AvailableNow drains pending files and stops;
    * the checkpoint makes each file processed exactly once across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String): StreamingQuery =
    readFiles(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
