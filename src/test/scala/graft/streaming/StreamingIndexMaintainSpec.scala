package graft.streaming

import graft.SparkSpec
import graft.similarity.{IvfIndex, ProductQuantizer}
import java.nio.file.Files

/** D38 — streaming index maintenance: the stream-appended index is
  * row-identical to a full rebuild over seed ∪ drops (and serves
  * identical search results), retries rewrite only their own
  * partitions, probe reads prune to the probed cid leaves, and a
  * planted occupancy skew fires the retrain gate while a same-shape
  * drop does not.
  */
class StreamingIndexMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val Buckets = 4

  private val model: ProductQuantizer.Model = {
    val books = (0 until 4).map { sub =>
      IvfIndex.Model(4, (0 until 4).map(c =>
        c -> Array.tabulate(4)(j => ((sub + 2 * c + 3 * j) % 5 - 2).toDouble)).toArray)
    }
    ProductQuantizer.Model(dim = Dim, m = 4, k = 4, books = books.toArray)
  }

  private def vec(seed: Long): Seq[Float] =
    (0 until Dim).map(d => (((seed * 7 + d * 13) % 9) - 4).toFloat)

  private def jsonl(vs: Seq[(Long, Seq[Float])]): String =
    vs.map { case (id, v) =>
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    }.mkString("\n")

  test("stream-appended index ≡ full rebuild; search results identical; exactly-once") {
    val in = Files.createTempDirectory("graft_imin").toString
    val idx = Files.createTempDirectory("graft_imidx").toString
    val mon = Files.createTempDirectory("graft_immon").toString
    val cp = Files.createTempDirectory("graft_imcp").toString

    val seed = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    StreamingIndexMaintain.initIndex(seed, model, Buckets, idx)
    val ref = StreamingIndexMaintain.seedOccupancy(seed, model, Buckets).persist()

    val drop0 = (40L until 52L).map(i => (i, vec(i)))
    val drop1 = (52L until 60L).map(i => (i, vec(i * 3)))
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(drop0))
    StreamingIndexMaintain.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)
    Files.writeString(java.nio.file.Paths.get(in, "d1.jsonl"), jsonl(drop1))
    StreamingIndexMaintain.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)

    // the maintained index holds EXACTLY the rebuild's rows
    val maintained = StreamingIndexMaintain.readIndex(spark, idx)
      .as[(Long, Seq[Int], Int)].collect().toSet
    val rebuilt = StreamingAnnServe.buildIndex(
      seed.union((drop0 ++ drop1).toDF("vec_id", "embedding")), model, Buckets)
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(maintained === rebuilt,
      "frozen-model encode must make append ≡ rebuild, row for row")

    // and a served search over the maintained index equals the rebuild's
    val queries = Seq((0L, vec(5)), (1L, vec(41)), (2L, vec(77)))
      .toDF("query_id", "embedding")
    def results(index: org.apache.spark.sql.DataFrame) =
      StreamingAnnServe.verdicts(queries, index, model, Buckets, nprobe = 2, k = 3)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(results(StreamingIndexMaintain.readIndex(spark, idx)) ===
      results(StreamingAnnServe.buildIndex(
        seed.union((drop0 ++ drop1).toDF("vec_id", "embedding")), model, Buckets)),
      "serving the maintained index ≡ serving the rebuild")

    // retry idempotence: replaying drop 0's batch rewrites only its
    // own (cid, batch_no) leaves — the index is unchanged
    val before = StreamingIndexMaintain.readIndex(spark, idx).count()
    StreamingIndexMaintain.maintainBatch(drop0.toDF("vec_id", "embedding"), 0L,
      model, Buckets, idx, mon, ref, 30.0)
    assert(StreamingIndexMaintain.readIndex(spark, idx).count() === before,
      "an at-least-once replay must not duplicate index rows")

    // probe-time partition pruning: a cid-filtered read scans only
    // that bucket's files (the layout contract behind nprobe reads;
    // the LayoutSpec technique — AQE off so the scan node is visible)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan = try {
      val pruned = spark.read.parquet(idx).where($"cid" === 1)
      pruned.collect()
      pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec in plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scan.partitionFilters.nonEmpty, "cid filter must prune partitions")
    assert(scan.metrics("numFiles").value < spark.read.parquet(idx).inputFiles.length,
      "the cid=1 scan must touch fewer files than the full index")
    ref.unpersist(); ()
  }

  test("occupancy drift fires the retrain gate on a planted skew, not on same-shape drops") {
    val in = Files.createTempDirectory("graft_imin2").toString
    val idx = Files.createTempDirectory("graft_imidx2").toString
    val mon = Files.createTempDirectory("graft_immon2").toString
    val cp = Files.createTempDirectory("graft_imcp2").toString

    val seed = (0L until 400L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    StreamingIndexMaintain.initIndex(seed, model, Buckets, idx)
    val ref = StreamingIndexMaintain.seedOccupancy(seed, model, Buckets).persist()

    // drop 0: same generator → same routing shape (vec_id % Buckets
    // is the coarse bucket, ids cycle all residues uniformly);
    // drop 1: every id ≡ 2 (mod Buckets) → all mass in ONE bucket
    val same = (400L until 480L).map(i => (i, vec(i)))
    val skew = (0L until 80L).map(j => (482L + 4 * j, vec(482L + 4 * j)))
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(same))
    StreamingIndexMaintain.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)
    Files.writeString(java.nio.file.Paths.get(in, "d1.jsonl"), jsonl(skew))
    StreamingIndexMaintain.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)

    val gates = spark.read.parquet(mon)
      .select("batch_no", "retrain_gate")
      .as[(Long, Boolean)].collect().toMap
    assert(gates(0L) === false, "a same-shape drop must not gate a retrain")
    assert(gates(1L) === true, "a one-bucket skew must fire the retrain gate")
    ref.unpersist(); ()
  }
}
