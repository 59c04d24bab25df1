package graft.streaming

import graft.SparkSpec
import graft.similarity.{IvfIndex, ProductQuantizer}
import java.nio.file.Files

/** D31 — streaming ANN serving: per-batch top-k verdicts equal the
  * batch IVFADC core on the same index, results stay inside probed
  * buckets, and batches land exactly once.
  */
class StreamingAnnServeSpec extends SparkSpec {
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

  test("stream verdicts equal the batch IVFADC core; results stay in probed buckets") {
    val in = Files.createTempDirectory("graft_annin").toString
    val out = Files.createTempDirectory("graft_annout").toString
    val cp = Files.createTempDirectory("graft_anncp").toString

    val corpus = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val index = StreamingAnnServe.buildIndex(corpus, model, Buckets).persist()
    try {
      def jsonl(qs: Seq[(Long, Seq[Float])]): String =
        qs.map { case (id, v) =>
          s"""{"query_id": $id, "embedding": [${v.mkString(",")}]}"""
        }.mkString("\n")
      val b0 = Seq((0L, vec(3)), (1L, vec(17)), (2L, vec(99)))
      Files.writeString(java.nio.file.Paths.get(in, "b0.jsonl"), jsonl(b0))
      StreamingAnnServe.start(spark, in, index, model, out, cp,
        buckets = Buckets, nprobe = 2, k = 3).awaitTermination(60000)
      val b1 = Seq((3L, vec(8)))
      Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
      StreamingAnnServe.start(spark, in, index, model, out, cp,
        buckets = Buckets, nprobe = 2, k = 3).awaitTermination(60000)

      val got = spark.read.parquet(out)
        .select("batch_no", "query_id", "rk", "vec_id", "adc_dist")
        .as[(Long, Long, Long, Long, Double)].collect()
        .sortBy(r => (r._1, r._2, r._3))
      assert(got.map(_._1).distinct.toSeq == Seq(0L, 1L), "both batches landed once")
      // every query returns k results, all from its probed buckets
      got.groupBy(r => (r._1, r._2)).foreach { case ((_, qid), rows) =>
        assert(rows.length == 3, s"query $qid: ${rows.length} results")
        val probed = Set(qid % Buckets, (qid + 1) % Buckets)
        assert(rows.forall(r => probed.contains(r._4 % Buckets)),
          s"query $qid escaped its probes: ${rows.mkString(", ")}")
      }
      // stream batch 0 ≡ the batch core, bit-for-bit
      val core = StreamingAnnServe.verdicts(
        b0.toDF("query_id", "embedding"), index, model, Buckets, nprobe = 2, k = 3)
        .select("query_id", "rk", "vec_id", "adc_dist")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val streamed0 = got.filter(_._1 == 0L).map(r => (r._2, r._3, r._4, r._5)).toSeq
      assert(streamed0 === core)
    } finally index.unpersist()
  }
}
