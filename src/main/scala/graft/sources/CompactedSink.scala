package graft.sources

import org.apache.spark.sql.DataFrame

/** Small-files control for parquet sinks. At 100 TB the classic
  * failure is the inverse problem at both ends: thousands of tiny
  * files per write (one per task) that crush the namenode and every
  * downstream scan's split planning, or a handful of multi-GB files
  * that serialize downstream parallelism. Sizing the partition count
  * from the plan's own Catalyst statistics keeps output files near a
  * target size without a second read-and-rewrite compaction job.
  *
  * The estimate is the in-memory row size; parquet encoding+compression
  * typically shrinks that 2-5×, so `compressionRatio` (default 3)
  * scales the estimate — tune per dataset when file sizes matter
  * precisely. The point is the ORDER OF MAGNITUDE: 40 ~100 MB files,
  * not 4000 ~1 MB ones.
  */
object CompactedSink {

  /** Partition count that lands output files near targetBytes. */
  def plannedPartitions(df: DataFrame, targetBytes: Long = 128L << 20,
                        compressionRatio: Double = 3.0): Int = {
    require(targetBytes > 0 && compressionRatio > 0)
    val estBytes = BigDecimal(df.queryExecution.optimizedPlan.stats.sizeInBytes) / compressionRatio
    val n = (estBytes / targetBytes).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
    math.max(1, math.min(n, 100000))
  }

  /** Repartition to the planned count and write parquet; returns the
    * file-count target used (for observability/assertions).
    */
  def writeParquet(df: DataFrame, path: String, targetBytes: Long = 128L << 20,
                   compressionRatio: Double = 3.0): Int = {
    val n = plannedPartitions(df, targetBytes, compressionRatio)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
