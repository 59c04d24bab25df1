package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IncrementalAgg
import graft.sources.TxLog

/** D27 — a MATERIALIZED VIEW maintained continuously over a TxLog
  * table that a streaming sink (D26) is feeding: the full lakehouse
  * loop closed. The maintainer tracks the last table version it has
  * applied; on each refresh it pulls `TxLog.changes(lastApplied,
  * head)` — cost ∝ what the interval touched, never the table — and
  * folds the delta into the view with [[IncrementalAgg.applyDelta]]
  * (the change feed's `_change` column IS the delta op column). The
  * view plus its watermark version are themselves stored in a TxLog
  * table via an idempotent `txn` commit, so a crashed-and-retried
  * refresh is a no-op and the maintainer RESUMES from the stored
  * watermark after a cold restart (StreamingTxLogViewSpec runs one:
  * new maintainer instance, same stores, no reprocessing).
  *
  * Every refresh is exact: maintained view ≡ a full recompute of the
  * source at the applied version (the q157 identity, applied
  * repeatedly) — the spec asserts it after every refresh, including
  * refreshes spanning deletes and upserts.
  */
final class StreamingTxLogView(spark: SparkSession, sourceTable: String,
                               viewTable: String, keyCols: Seq[String],
                               sumCols: Seq[String]) {

  private val app = s"view:$viewTable"

  /** The version of the source the stored view reflects, or -1 when
    * the view has never been materialized.
    */
  def appliedVersion(): Long =
    try TxLog.snapshot(viewTable).txns.getOrElse(app, -1L)
    catch { case _: IllegalArgumentException => -1L }

  /** The maintained view as stored. */
  def view(): DataFrame = TxLog.read(spark, viewTable)

  /** Catch the view up to the source head. Returns the new applied
    * version (unchanged if the source hasn't advanced). The view
    * rewrite and the watermark advance are ONE log commit, so a
    * crashed-and-retried refresh can never apply a delta twice; the
    * old view files serve readers until the commit lands (and feed
    * the delta join itself — reads are snapshot-isolated from the
    * staged rewrite).
    */
  def refresh(): Long = {
    val head = TxLog.snapshot(sourceTable).version
    val applied = appliedVersion()
    if (applied >= head) return applied
    val next =
      if (applied < 0) IncrementalAgg.init(
        TxLog.read(spark, sourceTable, Some(head)), keyCols, sumCols)
      else IncrementalAgg.applyDelta(
        view(), TxLog.changes(spark, sourceTable, applied, head),
        keyCols, sumCols, opCol = "_change")
    if (TxLog.latestVersion(viewTable).isEmpty)
      TxLog.create(spark, next, viewTable, txn = Some(app -> head))
    else
      TxLog.overwrite(spark, next, viewTable, txn = Some(app -> head))
    head
  }
}
