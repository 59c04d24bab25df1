package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** InvertedIndex: postings/stats correctness, save/readTerms round
  * trip, and partition pruning to the queried terms' buckets
  * asserted on scan metrics.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick fox jumps the fence"),
    (2L, "the slow fox sleeps"),
    (3L, "quick quick quick")).toDF("doc_id", "text")

  test("postings carry exact tf; stats carry df and total tf") {
    val post = InvertedIndex.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(post.contains(("the", 1L, 2L)) && post.contains(("the", 2L, 1L)))
    assert(post.contains(("quick", 3L, 3L)) && post.contains(("quick", 1L, 1L)))
    assert(!post.exists(_._1 == "missing"))
    val stats = InvertedIndex.termStats(InvertedIndex.postings(docs, "doc_id", "text"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats("the") == (2L, 3L))
    assert(stats("quick") == (2L, 4L))
    assert(stats("fox") == (2L, 2L))
  }

  test("save/readTerms round trip; scan prunes to the terms' buckets") {
    val dir = Files.createTempDirectory("graft_invidx").toString
    val post = InvertedIndex.postings(docs, "doc_id", "text")
    InvertedIndex.save(post, dir, nBuckets = 16)
    val got = InvertedIndex.readTerms(spark, dir, Seq("quick", "fence"), nBuckets = 16)
    val rows = got.as[(String, Long, Long)].collect().toSet
    assert(rows == Set(("quick", 1L, 1L), ("quick", 3L, 3L), ("fence", 1L, 1L)))
    // scan metrics: only the queried buckets' partitions are read
    // (AQE disabled so the scan node's metrics are reachable — the
    // LayoutSpec idiom)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan = try {
      val q = InvertedIndex.readTerms(spark, dir, Seq("quick", "fence"), nBuckets = 16)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec in plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scan.partitionFilters.nonEmpty, "bucket filter must prune partitions")
    val wanted = Seq("quick", "fence").map(InvertedIndex.bucketOf(_, 16)).distinct.size
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    partsRead.foreach(p => assert(p <= wanted, s"read $p partitions for $wanted buckets"))
    // the driver-side bucket twin matches the column expression
    val colBuckets = post.select(col("term"),
        InvertedIndex.termBucket(col("term"), 16).as("b"))
      .as[(String, Long)].collect().toMap
    colBuckets.foreach { case (t, b) => assert(InvertedIndex.bucketOf(t, 16) == b, t) }
  }
}
