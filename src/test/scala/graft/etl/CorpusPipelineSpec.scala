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

  test("curation scores from the persisted TRAINED classifier; AUC beats the stand-in") {
    import graft.functions.{Perceptron, Stats}
    // Planted-vocabulary corpus: positives and negatives are the SAME
    // length but draw from disjoint vocabularies, so the label is
    // learnable from content only — the stand-in's fixed hash weights
    // can't systematically separate equal-mass classes, while the
    // perceptron learns the vocabulary split.
    val corpus = (1L to 40L).map { i =>
      val pfx = if (i % 2 == 0) "p" else "n"
      (i, Seq.tabulate(30)(j => s"$pfx${(i * 7 + j) % 50}").mkString(" "))
    }.toDF("doc_id", "text")
    val model = Perceptron.trainBatch(corpus, "doc_id", "text",
      posLabel = col("doc_id") % 2 === 0, buckets = 256, epochs = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_cp_model").toString
    Perceptron.save(model, dir, spark)

    // save→load→score round trip is exact: curate's margins from the
    // persisted model equal scoring with the in-memory model
    val cfg = CorpusPipeline.Config(dedupJaccard = 0.6,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8),
      classifierModelDir = Some(dir))
    val trained = CorpusPipeline.curate(corpus, cfg).cache()
    val direct = Perceptron.score(corpus, "doc_id", "text", model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin")).toMap
    trained.select("doc_id", "classifier_margin").collect().foreach { r =>
      assert(r.getAs[Long]("classifier_margin") ===
        direct.getOrElse(r.getAs[Long]("doc_id"), 0L))
    }

    // and the trained margins separate the planted label where the
    // stand-in hash weights sit near chance
    val standin = CorpusPipeline.curate(corpus, cfg.copy(classifierModelDir = None))
    def aucOf(df: org.apache.spark.sql.DataFrame): Double =
      Stats.auc(df, col("classifier_margin"), col("doc_id") % 2 === 0)
        .collect().head.getAs[Double]("auc")
    val (aTrained, aStandin) = (aucOf(trained), aucOf(standin))
    assert(aTrained >= 0.95, s"trained AUC $aTrained should separate the planted label")
    assert(aTrained > aStandin + 0.2,
      s"trained AUC $aTrained must beat the stand-in's $aStandin")
    trained.unpersist()
  }

  test("blocklist gate: banned phrases filter with reason, hits annotate") {
    val gated = CorpusPipeline.curate(docs, CorpusPipeline.Config(dedupJaccard = 0.6,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8),
      blocklist = Some(Seq("lazy dog", "quick")), maxBlocklistHits = 6L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 1/2 repeat the phrases 6x each -> 12 hits > 6: blocked
    assert(gated(1L).getAs[Long]("block_hits") === 12L)
    assert(gated(1L).getAs[String]("filter_reason") === "blocklist")
    assert(!gated(1L).getAs[Boolean]("keep"))
    // clean docs annotate zero hits; earlier gates still win
    assert(gated(3L).getAs[Long]("block_hits") === 0L)
    assert(gated(3L).getAs[String]("filter_reason") === "language")
    // default config: stage off, no block_hits column
    assert(!curated(1L).schema.fieldNames.contains("block_hits"))
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

  test("span-dedup, LM-perplexity and semantic-dedup stages compose; every row keeps its decision") {
    // the id is IN the salt: no shifted alignment of two docs' salt
    // sequences can ever match a 20-token window across docs (the
    // (id*31+j)%997 scheme admits period-13 shift collisions)
    def enDoc(id: Long) =
      good.trim.split(" ").zipWithIndex
        .map { case (w, j) => s"$w w${id}j${j}x" }.mkString(" ")
    // 25 real English words so the span-heavy doc still passes langid
    val span = "the quiet river winds slowly past the ancient mill where " +
      "stones remember every footstep taken beneath the autumn sky while " +
      "birds gather softly before dusk"
    val rare = ("whosoever bramble thicket yonder lantern cobbled harbinger sundry " +
      "gossamer alembic tallow flagon ewer bulwark parapet buttress cloister " +
      "moreover thereupon hitherto notwithstanding forsooth albeit whence thither")
    val corpus =
      (10L to 40L).map(id => (id, enDoc(id))) ++ Seq(
        (50L, rare),                       // corpus-rare tokens → LM gate
        (60L, span + " s60a s60b s60c s60d s60e"), // mostly a shared span → span_dup
        (61L, enDoc(61) + " " + span),     // long doc sharing the span → survives
        (70L, enDoc(70)),                  // sem-dup pair: distinct texts,
        (71L, enDoc(71)))                  //   near-identical embeddings
    val docs = corpus.toDF("doc_id", "text")

    // threshold between the clean docs' scores and the rare doc's
    val scores = graft.functions.UnigramLm.score(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_neg_logp")).toMap
    val cleanMax = (corpus.map(_._1).toSet - 50L).map(scores).max
    assert(scores(50L) > cleanMax, "rare-token doc must score above every clean doc")
    val lmT = (cleanMax + scores(50L)) / 2
    // allow whatever language the n-gram heuristic assigns the rare
    // doc, so the LM gate (not the language gate) is what fires on it
    val rareLang = graft.functions.LangId.detected(docs.filter(col("doc_id") === 50L), "text")
      .select(col("lang_detect.lang")).collect().head.getString(0)

    def pad(v: Float*): Array[Float] = (v ++ Seq.fill(8 - v.length)(0.1f)).toArray
    val embeddings = Seq(
      (70L, pad(10f, 10f, 10f)),
      (71L, pad(10.0001f, 10.0002f, 10f))).toDF("doc_id", "embedding")

    // word shingles: every word 3-gram carries a doc-unique salt, so
    // the salted docs are lexically independent by construction (char
    // trigrams would overlap across salts and near the 0.97 bar)
    val cfg = CorpusPipeline.Config(
      minQuality = 0.2,
      allowedLangs = Seq("en", rareLang).distinct,
      dedupJaccard = 0.97,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8, wordShingles = true),
      maxAvgNegLogp = Some(lmT),
      spanDedupW = Some(20),
      semDedupThreshold = Some(0.99), semDedupDim = 8)
    val out = CorpusPipeline.curate(docs, cfg, embeddings = Some(embeddings))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out.size === corpus.size, "every input row is retained with its decision")
    assert(out(50L).getAs[String]("filter_reason") === "lm_perplexity")
    assert(!out(50L).getAs[Boolean]("keep"))
    assert(out(60L).getAs[String]("filter_reason") === "span_dup")
    assert(out(60L).getAs[Long]("dup_tokens") === 25L,
      "island union over the shared span must measure its exact token mass")
    assert(out(61L).getAs[String]("filter_reason") === null,
      "a long doc whose span share is below the fraction survives")
    assert(out(61L).getAs[Boolean]("keep"))
    assert(out(70L).getAs[Boolean]("keep"))
    assert(!out(71L).getAs[Boolean]("keep"), "semantic dup must lose keep")
    assert(out(71L).getAs[Long]("sem_dup_of") === 70L)
    assert(out(71L).getAs[String]("filter_reason") === null &&
      out(71L).getAs[Boolean]("is_keeper"),
      "sem-dup is a dedup decision, not a filter: lexical columns unchanged")
    assert((10L to 40L).forall(id => out(id).getAs[Boolean]("keep")),
      "clean salted docs pass all three new stages")
  }

  test("a domain link graph steers keep/drop through the PageRank prior") {
    def enDoc(id: Long) =
      good.trim.split(" ").zipWithIndex
        .map { case (w, j) => s"$w w${id}j${j}x" }.mkString(" ")
    val docs = Seq(
      (1L, enDoc(1), "hub.example"),
      (2L, enDoc(2), "hub.example"),
      (3L, enDoc(3), "junk.example"),   // only ever a link SOURCE → low rank
      (4L, enDoc(4), "offgraph.example") // absent from the graph → ungated
    ).toDF("doc_id", "text", "source")
    val edges = Seq(
      ("a.example", "hub.example"), ("b.example", "hub.example"),
      ("c.example", "hub.example"), ("junk.example", "hub.example"))
      .toDF("src", "dst")
    val base = CorpusPipeline.Config(
      minQuality = 0.2, dedupJaccard = 0.97,
      minhash = graft.dedup.MinHashLsh.Config(bands = 8, wordShingles = true))

    // pass 1: annotate only — read the deterministic ranks
    val annotated = CorpusPipeline.curate(docs, base, domainEdges = Some(edges))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val hubRank = annotated(1L).getAs[Double]("domain_rank")
    val junkRank = annotated(3L).getAs[Double]("domain_rank")
    assert(hubRank > junkRank, "the link hub must outrank a pure source")
    assert(annotated(4L).getAs[Any]("domain_rank") == null)
    assert(annotated.values.forall(_.getAs[String]("filter_reason") == null),
      "without minDomainRank the prior only annotates")

    // pass 2: gate between the two ranks
    val gated = CorpusPipeline.curate(docs,
      base.copy(minDomainRank = Some((hubRank + junkRank) / 2)),
      domainEdges = Some(edges))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(gated(3L).getAs[String]("filter_reason") === "low_rank")
    assert(!gated(3L).getAs[Boolean]("keep"))
    assert(gated(1L).getAs[Boolean]("keep") && gated(2L).getAs[Boolean]("keep"))
    assert(gated(4L).getAs[String]("filter_reason") === null,
      "a domain with no link evidence is not rank-gated")
    assert(gated(4L).getAs[Boolean]("keep"))
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
