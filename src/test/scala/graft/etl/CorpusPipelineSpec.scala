package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and runs to town " * 6
  private val docs = Seq(
    (1L, good),                                  // kept
    (2L, good + " the end"),                     // near-dup of 1 → grouped, not keeper
    (3L, "der die das und ist nicht mit ein " * 8),       // german → language
    (4L, "tiny"),                                // too short AND low quality
    (5L, "a b! c? d# e$ f% g^ h& i* j( k) " * 5) // punctuation soup → low quality
  ).toDF("doc_id", "text")

  private lazy val curated =
    CorpusPipeline.curate(docs, CorpusPipeline.Config(dedupJaccard = 0.6,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("filters annotate reasons and keep all rows") {
    assert(curated.size == 5)
    assert(curated(3L).getAs[String]("filter_reason") == "language")
    assert(curated(5L).getAs[String]("filter_reason") == "low_quality")
    assert(curated(4L).getAs[String]("filter_reason") != null)
    assert(curated(1L).getAs[String]("filter_reason") == null)
  }

  test("near-duplicates collapse to one keeper per group") {
    val g1 = curated(1L); val g2 = curated(2L)
    assert(g1.getAs[Long]("group_id") == g2.getAs[Long]("group_id"))
    assert(g1.getAs[Boolean]("is_keeper") && !g2.getAs[Boolean]("is_keeper"))
    assert(g1.getAs[Boolean]("keep") && !g2.getAs[Boolean]("keep"))
  }

  test("every row gets a deterministic split label") {
    assert(curated.values.forall(r =>
      Seq("train", "val", "test").contains(r.getAs[String]("split"))))
  }

  test("report aggregates decisions per split") {
    val rep = CorpusPipeline.report(
      CorpusPipeline.curate(docs, CorpusPipeline.Config(dedupJaccard = 0.6,
        minhash = graft.dedup.MinHashLsh.Config(bands = 8))))
      .select("decision", "n").as[(String, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sum }
    assert(rep("kept") == 1L)
    assert(rep("near_duplicate") == 1L)
    assert(rep.values.sum == 5L)
  }
}
