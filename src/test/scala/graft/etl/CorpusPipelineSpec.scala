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

  test("classifier margin annotates every row; the optional gate filters below threshold") {
    // default config: margin annotated, gate off
    assert(curated.values.forall(r => r.getAs[Any]("classifier_margin") != null))
    val m1 = curated(1L).getAs[Long]("classifier_margin")
    // re-run with the gate just above doc 1's margin: doc 1 now filters
    // with reason "classifier" (earlier gates still win for docs 3-5)
    val gated = CorpusPipeline.curate(docs, CorpusPipeline.Config(dedupJaccard = 0.6,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8),
      minClassifierMargin = Some(m1 + 1))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(gated(1L).getAs[String]("filter_reason") == "classifier")
    assert(!gated(1L).getAs[Boolean]("keep"))
    assert(gated(3L).getAs[String]("filter_reason") == "language",
      "earlier gates still take precedence over the classifier gate")
  }

  test("full recipe: decontaminate + temperature-mix + pack") {
    // deterministic split membership first, so a test→train leak can
    // be planted knowingly
    val buckets = spark.range(1, 200)
      .select(col("id"), graft.functions.Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect()
    val trainIds = buckets.filter(_._2 < 90).map(_._1)
    val testIds = buckets.filter(_._2 >= 95).map(_._1)
    assert(trainIds.length > 20 && testIds.nonEmpty)

    val secret = "the secret zebra equation holds at midnight under the old stone bridge"
    // interleave doc-specific salt words between the shared template
    // words: every 8-gram outside `secret` then contains a salt, so
    // clean docs share no gram with the test doc (the template itself
    // would otherwise be a genuine leak and flag everything)
    def enDoc(id: Long) =
      good.trim.split(" ").zipWithIndex
        .map { case (w, j) => s"$w w${(id * 31 + j) % 997}x" }.mkString(" ")
    // salted bodies keep the leak pair BELOW the dedup threshold
    // (otherwise dedup would collapse them before decontamination
    // ever sees the shared grams) while the 12-word secret still
    // shares its 8-grams
    val corpus =
      Seq((testIds.head, enDoc(testIds.head) + " " + secret)) ++  // test doc carrying the secret
      Seq((trainIds.head, enDoc(trainIds.head) + " " + secret)) ++ // LEAK: train doc quoting it
      trainIds.tail.take(30).map(id => (id, enDoc(id)))            // clean train docs
    val docs = corpus.toDF("doc_id", "text")

    val cfg = CorpusPipeline.Config(
      minQuality = 0.2,
      dedupJaccard = 0.97, minhash = graft.dedup.MinHashLsh.Config(bands = 8),
      decontamGramN = Some(8), temperatureMix = true, packSeqLen = Some(64L))
    val out = CorpusPipeline.curate(docs, cfg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // the planted leak is flagged and dropped; the test doc keeps
    val leak = out(trainIds.head)
    assert(leak.getAs[Boolean]("contaminated") && !leak.getAs[Boolean]("keep"))
    // clean kept train docs are not flagged (bloom FP-free at this m)
    val cleanKept = trainIds.tail.take(30).map(out).filter(_.getAs[String]("filter_reason") == null)
    assert(cleanKept.forall(!_.getAs[Boolean]("contaminated")))

    // single-language corpus: temperature mix is the identity on keep
    // (smallest domain keeps everything) — no clean doc lost to it
    assert(cleanKept.exists(_.getAs[Boolean]("keep")))

    // packing: kept docs get writer/sequence columns, dropped get null
    out.values.foreach { r =>
      if (r.getAs[Boolean]("keep")) {
        assert(!r.isNullAt(r.fieldIndex("writer")))
        assert(r.getAs[Long]("end_seq") >= r.getAs[Long]("start_seq"))
      } else assert(r.isNullAt(r.fieldIndex("writer")))
    }
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
