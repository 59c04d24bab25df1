package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.TxLog

/** D26 — EXACTLY-ONCE streaming delivery into a [[TxLog]] table.
  *
  * Structured Streaming's foreachBatch gives at-least-once batch
  * delivery: after a crash between "sink wrote" and "checkpoint
  * advanced", the same (batchId, data) is replayed. The txlog closes
  * the gap transactionally — [[TxLog.streamCommit]] writes the batch's
  * add-actions and the `txn` watermark `(app, batchId)` in ONE atomic
  * log commit, so the replayed batch sees `txn >= batchId` in the
  * snapshot and becomes a no-op. This is the idempotent-sink recipe
  * the Delta Lake paper describes for its streaming writer, on our own
  * log. Unlike a parquet `append` sink, a retried batch can never
  * double its rows, and a cold RESTART from the same checkpoint (or a
  * rebuilt one re-delivering earlier batches) composes by the same
  * watermark test — StreamingTxLogSpec runs both.
  *
  * Scale shape: per micro-batch one staged parquet write (partitioned
  * however the batch df is) + one O(1) log commit; the table then
  * serves batch readers through the ordinary snapshot/pruning path —
  * streaming ingestion and batch analytics meet at one table without
  * a compaction hand-off (TxLog.compact runs as maintenance whenever).
  */
object StreamingTxLog {

  /** Start writing `rows` into the txlog table at `table` (which must
    * already exist — create it with `TxLog.create`). `app` names the
    * writer for idempotence; two different apps can feed one table.
    */
  def start[T](rows: Dataset[T], table: String, checkpoint: String,
               app: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        TxLog.streamCommit(batch.sparkSession, batch.toDF(), table, app, batchId)
        ()
      }
      .start()

  /** One replayable batch commit — the unit the spec drives directly
    * to simulate the crash/replay window without a real crash.
    */
  def commitBatch(batch: DataFrame, table: String, app: String, batchId: Long): Boolean =
    TxLog.streamCommit(batch.sparkSession, batch, table, app, batchId)
}
