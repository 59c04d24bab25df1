package graft.streaming

import graft.SparkSpec
import graft.similarity.{GraphAnn, IvfIndex}
import java.nio.file.Files

/** D39 — streaming graph-ANN serving: per-batch top-k verdicts equal
  * the batch kernel (searchSaved) on the same persisted index, and
  * batches land exactly once.
  */
class StreamingGraphServeSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16

  private def vec(seed: Long): Seq[Float] =
    (0 until Dim).map(d => (((seed * 7 + d * 13) % 9) - 4).toFloat)

  test("stream verdicts equal the batch kernel on the saved index; exactly-once") {
    val in = Files.createTempDirectory("graft_gsin").toString
    val idx = Files.createTempDirectory("graft_gsidx").toString
    val out = Files.createTempDirectory("graft_gsout").toString
    val cp = Files.createTempDirectory("graft_gscp").toString

    val corpus = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val model = IvfIndex.trainCentroidsQuantized(corpus, dim = Dim, nCentroids = 4)
    val kn = GraphAnn.scaledKnobs(40L)
    val edges = GraphAnn.knnGraph(corpus, model, degree = kn.degree, nprobe = 3)
    GraphAnn.save(corpus, edges, kn, model.scaleBits, idx, srcBuckets = 4)

    def jsonl(qs: Seq[(Long, Seq[Float])]): String =
      qs.map { case (id, v) =>
        s"""{"query_id": $id, "embedding": [${v.mkString(",")}]}"""
      }.mkString("\n")
    val b0 = Seq((0L, vec(3)), (1L, vec(17)), (2L, vec(99)))
    Files.writeString(java.nio.file.Paths.get(in, "b0.jsonl"), jsonl(b0))
    StreamingGraphServe.start(spark, in, idx, out, cp, k = 3).awaitTermination(60000)
    val b1 = Seq((3L, vec(8)))
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingGraphServe.start(spark, in, idx, out, cp, k = 3).awaitTermination(60000)

    val got = spark.read.parquet(out)
      .select("batch_no", "query_id", "rk", "vec_id", "idist")
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.map(_._1).distinct.toSeq == Seq(0L, 1L), "both batches landed once")
    got.groupBy(r => (r._1, r._2)).foreach { case ((_, qid), rows) =>
      assert(rows.length == 3, s"query $qid: ${rows.length} results")
    }
    // stream batch 0 ≡ the batch kernel on the same saved index
    val core = GraphAnn.searchSaved(spark, idx,
      b0.toDF("query_id", "embedding"), k = 3)
      .select("query_id", "rk", "vec_id", "idist")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val streamed0 = got.filter(_._1 == 0L).map(r => (r._2, r._3, r._4, r._5)).toSeq
    assert(streamed0 === core, "stream ≡ batch kernel, bit for bit")
  }
}
