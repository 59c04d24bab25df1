package graft.streaming

import graft.SparkSpec
import graft.similarity.{IvfIndex, ProductQuantizer}
import java.nio.file.Files

/** D41 — streaming embed-and-index: raw text drops land as maintained
  * PQ index rows identical to a batch rebuild over all text seen, and
  * a query embedded from duplicated text retrieves the same verdicts
  * from the maintained index as from the rebuild.
  */
class StreamingEmbedIngestSpec extends SparkSpec {
  import spark.implicits._

  private val Buckets = 4

  private val model: ProductQuantizer.Model = {
    val books = (0 until 8).map { sub =>
      IvfIndex.Model(8, (0 until 4).map(c =>
        c -> Array.tabulate(8)(j => ((sub + 2 * c + 3 * j) % 5 - 2).toDouble)).toArray)
    }
    ProductQuantizer.Model(dim = StreamingEmbedIngest.Dim, m = 8, k = 4,
      books = books.toArray)
  }

  private def text(seed: Long): String =
    (0 until 12).map(j => s"w${(seed * 13 + j * 7) % 23}").mkString(" ")

  private def jsonl(docs: Seq[(Long, String)]): String =
    docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n")

  test("text drops maintain an index identical to the batch rebuild; search parity") {
    val in = Files.createTempDirectory("graft_eiin").toString
    val idx = Files.createTempDirectory("graft_eiidx").toString
    val mon = Files.createTempDirectory("graft_eimon").toString
    val cp = Files.createTempDirectory("graft_eicp").toString

    val seedDocs = (0L until 30L).map(i => (i, text(i)))
    val seedVecs = StreamingEmbedIngest.embedBatch(seedDocs.toDF("doc_id", "text"))
    StreamingIndexMaintain.initIndex(seedVecs, model, Buckets, idx)
    val ref = StreamingIndexMaintain.seedOccupancy(seedVecs, model, Buckets).persist()

    val drop0 = (30L until 38L).map(i => (i, text(i)))
    val drop1 = Seq((38L, text(5)), (39L, text(11))) // duplicated seed text
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(drop0))
    StreamingEmbedIngest.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)
    Files.writeString(java.nio.file.Paths.get(in, "d1.jsonl"), jsonl(drop1))
    StreamingEmbedIngest.start(spark, in, model, idx, mon, cp, ref, Buckets)
      .awaitTermination(60000)

    // maintained index ≡ rebuild over ALL text seen, end to end from raw text
    val allDocs = (seedDocs ++ drop0 ++ drop1).toDF("doc_id", "text")
    val rebuilt = StreamingAnnServe.buildIndex(
      StreamingEmbedIngest.embedBatch(allDocs), model, Buckets)
      .as[(Long, Seq[Int], Int)].collect().toSet
    val maintained = StreamingIndexMaintain.readIndex(spark, idx)
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(maintained === rebuilt,
      "deterministic embed + frozen-model encode ⇒ maintained ≡ rebuilt, from raw text")

    // search parity on a query embedded from the duplicated text
    val queries = StreamingEmbedIngest.embedBatch(Seq((0L, text(5))).toDF("doc_id", "text"))
      .select($"vec_id".as("query_id"), $"embedding")
    def results(index: org.apache.spark.sql.DataFrame) =
      StreamingAnnServe.verdicts(queries, index, model, Buckets, nprobe = 2, k = 3)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(results(StreamingIndexMaintain.readIndex(spark, idx)) ===
      results(StreamingAnnServe.buildIndex(
        StreamingEmbedIngest.embedBatch(allDocs), model, Buckets)))
    ref.unpersist(); ()
  }
}
