package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** D10 — streaming CDC APPLY: change files (key, values, delete flag,
  * change sequence) landing in a watched directory are merged into a
  * keyed snapshot per micro-batch with `Upsert.merge` — the streaming
  * MERGE INTO loop (q75's batch merge, run continuously).
  *
  * Within one micro-batch, last-writer-wins by the change sequence
  * (`seq`) — a batch carrying two versions of one key applies only
  * the newest, which is the contract `Upsert.merge` requires of its
  * callers.
  *
  * The snapshot directory is versioned by `batch_no` partitions
  * (copy-on-write: batch N writes the post-N snapshot into its own
  * partition with dynamic overwrite, reading the latest partition
  * BELOW N). A micro-batch retry therefore sees exactly the pre-batch
  * snapshot — even if the failed attempt already wrote — recomputes
  * the same merge, and rewrites exactly its own partition:
  * at-least-once foreachBatch becomes effective exactly-once. Old
  * partitions double as time-travel history until vacuumed.
  *
  * Scale: per micro-batch cost is one key-shuffle full-outer join of
  * (snapshot × delta) plus a full snapshot rewrite. The rewrite is
  * what table formats (Delta/Iceberg MERGE) optimize away by
  * rewriting only touched files; without a format, partition the
  * snapshot by a key range so each batch rewrites only partitions its
  * delta touches — the loop here is that design with a single range.
  */
object StreamingCdc {

  /** Streaming change feed from JSONL files: (seq, k, v, s, _delete). */
  def readChanges(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema("seq BIGINT, k BIGINT, v BIGINT, s STRING, _delete BOOLEAN")
      .option("pathGlobFilter", "*.jsonl")
      .json(inDir)

  /** Seed the snapshot directory (batch_no=-1 partition). */
  def initSnapshot(base: DataFrame, snapDir: String): Unit = {
    base.withColumn("batch_no", lit(-1L))
      .write.partitionBy("batch_no").parquet(snapDir)
    markCommitted(base.sparkSession, snapDir, -1L)
  }

  /** Per-batch COMMIT MARKERS: a batch_no partition counts only once
    * its `_COMMITTED_<n>` marker exists — written strictly AFTER the
    * partition write succeeds. A foreachBatch attempt that dies after
    * partially committing task files leaves a partition with no
    * marker, which `snapshot()` (external readers) then ignores; the
    * engine-side retry is already safe via the `batch_no < batchId`
    * read plus dynamic partition overwrite rewriting the whole
    * partition. Markers are tiny sidecar files next to the partition
    * dirs (underscore-prefixed, so parquet readers skip them).
    */
  private def markerPath(snapDir: String, n: Long) =
    new org.apache.hadoop.fs.Path(snapDir, s"_COMMITTED_$n")

  private[streaming] def markCommitted(spark: SparkSession, snapDir: String, n: Long): Unit = {
    val p = markerPath(snapDir, n)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  private[streaming] def committedBatches(spark: SparkSession, snapDir: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(snapDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("_COMMITTED_") => s.stripPrefix("_COMMITTED_").toLong }
  }

  /** One merge step; public for the spec's idempotence assertion. */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                                snapDir: String): Unit = {
    if (batch.isEmpty) return
    // latest COMMITTED snapshot strictly below this batch: a retry
    // must not see its own failed attempt's (marker-less) write
    val latestNo = committedBatches(spark, snapDir).filter(_ < batchId).max
    val current = spark.read.parquet(snapDir)
      .filter(col("batch_no") === latestNo).drop("batch_no")
    // within-batch last-writer-wins on the change sequence
    val byKey = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    val newest = batch.withColumn("_rn", row_number().over(byKey))
      .filter(col("_rn") === 1).drop("_rn", "seq")
    Upsert.merge(current, newest, Seq("k"))
      .filter(col("op") =!= "delete").drop("op")
      .withColumn("batch_no", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_no").parquet(snapDir)
    markCommitted(spark, snapDir, batchId)
  }

  /** Wire the loop; AvailableNow drains pending change files and
    * stops (the scheduled-run shape), checkpointing gives each file
    * to exactly one micro-batch across restarts.
    */
  def start(spark: SparkSession, inDir: String, snapDir: String,
            checkpointDir: String): StreamingQuery =
    readChanges(spark, inDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, snapDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The current snapshot: highest batch_no partition WITH a commit
    * marker — a partially-written partition from a crashed attempt
    * (no marker yet) is never served.
    */
  def snapshot(spark: SparkSession, snapDir: String): DataFrame = {
    val committed = committedBatches(spark, snapDir)
    require(committed.nonEmpty, s"no committed snapshot in $snapDir")
    spark.read.parquet(snapDir)
      .filter(col("batch_no") === committed.max).drop("batch_no")
  }

  /** TIME TRAVEL: the snapshot as of committed batch `n` (the state
    * external readers saw after that micro-batch), while it is still
    * retained.
    */
  def snapshotAt(spark: SparkSession, snapDir: String, n: Long): DataFrame = {
    require(committedBatches(spark, snapDir).contains(n),
      s"batch $n is not a committed, retained snapshot in $snapDir")
    spark.read.parquet(snapDir).filter(col("batch_no") === n).drop("batch_no")
  }

  /** VACUUM: drop all but the newest `keepLast` committed snapshot
    * versions — bounds the copy-on-write history (each version is a
    * full snapshot copy). Markers are removed BEFORE their partition
    * dirs, so a crash mid-vacuum can never leave a marker pointing at
    * deleted data (the inverse of the write-then-mark commit order);
    * the current snapshot is never eligible. Marker-less partitions
    * (crashed write attempts below the newest commit) are swept too.
    * Returns the batch numbers whose versions were removed.
    */
  def vacuum(spark: SparkSession, snapDir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, s"must retain at least the current snapshot: $keepLast")
    val committed = committedBatches(spark, snapDir).sorted
    require(committed.nonEmpty, s"no committed snapshot in $snapDir")
    val drop = committed.dropRight(keepLast)
    val dir = new org.apache.hadoop.fs.Path(snapDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { n =>
      fs.delete(markerPath(snapDir, n), false)
      fs.delete(new org.apache.hadoop.fs.Path(snapDir, s"batch_no=$n"), true)
    }
    // sweep crashed-attempt residue: partitions below the newest
    // commit that never earned a marker (a marker-less partition AT
    // or ABOVE it may be a write in flight — left alone)
    val keep = committed.drop(drop.length).toSet
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("batch_no=") => s.stripPrefix("batch_no=").toLong }
      .filter(n => n < committed.max && !keep.contains(n) && !drop.contains(n))
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(snapDir, s"batch_no=$n"), true))
    drop
  }
}
