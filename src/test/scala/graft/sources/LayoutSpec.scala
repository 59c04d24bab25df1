package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** B21 — on-disk LAYOUT for data skipping: the 100 TB fact-table
  * prescription is hive-partitioning on the coarse access key (date)
  * so queries touching a slice never list, open, or scan the rest.
  * Asserted on the executed plan's scan metrics, not assumed.
  */
class LayoutSpec extends SparkSpec {

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val ev = Tables.events(spark, sf())
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").mode("overwrite").parquet(dir)
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 3, s"need several partitions, got $nDays")

    val oneDay = ev.select("day").distinct().orderBy("day").head().getString(0)
    // AQE wraps finished stages in opaque QueryStageExec nodes;
    // disable it here so the scan node (and its metrics) is reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan = try {
      val q = spark.read.parquet(dir).filter(col("day") === oneDay)
        .groupBy("event_type").count()
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec in plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // partition filter present, and the scan touched ONE partition's
    // files — the other days were never listed into the scan
    assert(scan.partitionFilters.nonEmpty, "day filter must prune partitions, not scan+filter")
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    assert(filesRead < totalFiles, s"read $filesRead of $totalFiles files — no pruning")
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    partsRead.foreach(p => assert(p == 1L, s"expected 1 partition read, got $p"))
  }
}
