package graft.etl

import graft.dedup.{ConnectedComponents, MinHashLsh, SpanDedup}
import graft.functions.{LangId, Packing, PortableBloom, Sampling, TextFunctions, UnigramLm}
import graft.operators.PageRank
import graft.similarity.SemDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a pre-training
  * data pipeline actually runs, built entirely from graft's operators
  * so each stage keeps its documented 100 TB shape:
  *
  *   1. ANNOTATE      — quality score, language-ID, token count,
  *                      classifier margin (map-only); optionally a
  *                      corpus-derived unigram-LM perplexity proxy
  *                      (one reused tokenize shuffle) and a PageRank
  *                      domain-centrality prior from a link graph
  *                      (model-sized power iteration, broadcast join);
  *   2. FILTER        — quality/language/length gates + optional
  *                      model-based classifier, banned-phrase
  *                      blocklist (one-pass Aho-Corasick),
  *                      LM-perplexity, and low-domain-rank gates
  *                      (map-only);
  *   2b. SPAN DEDUP   (opt) — docs whose duplicated-span token mass
  *                      (vs the surviving corpus) exceeds a fraction
  *                      are filtered (hashed-window reduction);
  *   3. DEDUP         — MinHash-LSH candidate pairs → verified Jaccard →
  *                      connected components → one keeper per group;
  *   3b. SEM DEDUP    (opt) — embedding-level near-dup among the
  *                      keepers (sign-signature blocked cosine;
  *                      IVF-blocked at corpus scale);
  *   4. SPLIT         — deterministic md5-bucket train/val/test labels;
  *   5. DECONTAMINATE (opt) — kept train docs sharing any word n-gram
  *                      with the kept test split lose `keep` (bloom
  *                      membership, map-side probe);
  *   6. MIX           (opt) — T=2 temperature rebalancing of kept
  *                      token mass across languages (integer-exact
  *                      Bernoulli draw);
  *   7. PACK          (opt) — writer/sequence assignment for the
  *                      final kept docs (per-writer prefix sums).
  *
  * Output keeps EVERY input row with its annotations and decisions
  * (kept/filtered reason, group id, keeper flag, split, contaminated,
  * packing columns) — the good-file/bad-file pattern at corpus scale:
  * downstream consumers take `curated.filter($"keep")`, audits take
  * the rest.
  */
object CorpusPipeline {

  case class Config(
      minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en"),
      minTokens: Int = 10,
      /** Optional model-based gate: docs whose hashed-feature linear
        * margin falls below this are filtered with reason
        * "classifier" — the fastText-style filter slot in the recipe.
        * None disables the gate.
        */
      minClassifierMargin: Option[Long] = None,
      /** Path to a persisted trained classifier (Perceptron.save
        * layout). When set, `classifier_margin` comes from the TRAINED
        * weights (Perceptron.load + broadcast score — AUC 0.90+ on the
        * planted label) instead of LinearClassifier's declared
        * stand-in hash weights (AUC ~0.5). The production recipe:
        * train once (q212's tier), persist, and every curation run
        * loads the model-sized weight table and scores map-side.
        */
      classifierModelDir: Option[String] = None,
      /** Optional unigram-LM gate: docs whose corpus-derived mean
        * −ln p(token) (UnigramLm.score) exceeds this are filtered
        * with reason "lm_perplexity" — the CCNet-style perplexity
        * filter slot. None disables the gate.
        */
      maxAvgNegLogp: Option[Double] = None,
      /** Optional blocklist gate: docs with more than
        * `maxBlocklistHits` non-overlapping occurrences of ANY
        * listed phrase (Blocklist's one-pass Aho-Corasick scan) are
        * filtered with reason "blocklist" — the banned-phrase /
        * policy-filter slot. None disables the gate.
        */
      blocklist: Option[Seq[String]] = None,
      maxBlocklistHits: Long = 0L,
      /** Optional domain-centrality gate (needs `domainEdges`): docs
        * whose domain's PageRank falls below this are filtered with
        * reason "low_rank"; docs on domains absent from the graph are
        * NOT gated (no link evidence either way). None annotates
        * `domain_rank` without gating.
        */
      minDomainRank: Option[Double] = None,
      domainCol: String = "source",
      pagerankIters: Int = 20,
      pagerankTol: Option[Double] = Some(1e-9),
      /** Optional span-dedup gate: hashed `w`-token sliding-window
        * stats (SpanDedup.spanStats) over the surviving corpus; docs
        * whose duplicated token mass exceeds `spanMaxDupFrac` of
        * their tokens are filtered with reason "span_dup". None
        * disables the stage.
        */
      spanDedupW: Option[Int] = None,
      spanMaxDupFrac: Double = 0.5,
      /** Optional semantic dedup among lexical-dedup keepers (needs
        * `embeddings`): embedding cosine ≥ this within a blocking
        * bucket marks the larger id a duplicate (SemDedup min-id
        * keeper). None disables the stage.
        */
      semDedupThreshold: Option[Double] = None,
      semDedupDim: Int = 64,
      semDedupSignBits: Int = 4,
      dedupJaccard: Double = 0.8,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      minhash: MinHashLsh.Config = MinHashLsh.Config(),
      decontamGramN: Option[Int] = None,
      temperatureMix: Boolean = false,
      packSeqLen: Option[Long] = None,
      packWriters: Int = 8,
      bloomK: Int = 3,
      bloomM: Int = 1 << 20)

  /** docs: (idCol, textCol, …). Returns docs + annotation/decision
    * columns: quality, lang, n_tokens, filter_reason (null = passed),
    * group_id, is_keeper, split, keep — plus avg_neg_logp /
    * domain_rank / dup_tokens / sem_dup_of when the matching optional
    * stages are on.
    *
    * @param domainEdges optional domain-level link graph
    *        (src, dst — `domainCol`-valued strings): PageRank
    *        centrality joins in as the `domain_rank` quality prior
    *        (gated by cfg.minDomainRank). Domain ids are md5-folded,
    *        so the graph — and every rank — is deterministic.
    * @param embeddings optional (idCol, embedding Array[Float]) table
    *        enabling the semantic-dedup stage (cfg.semDedupThreshold).
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text",
             domainEdges: Option[DataFrame] = None,
             embeddings: Option[DataFrame] = None): DataFrame = {
    require(cfg.minDomainRank.isEmpty || domainEdges.nonEmpty,
      "minDomainRank needs a domainEdges link graph")
    require(cfg.semDedupThreshold.isEmpty || embeddings.nonEmpty,
      "semDedupThreshold needs an embeddings table")
    // 1. annotate (one map pass; the trained-classifier variant adds
    // one broadcast join + per-doc aggregate — still nothing
    // corpus-sized crosses an exchange)
    val annotatedQ = LangId.detected(docs, textCol)
      .withColumn("lang", col("lang_detect.lang")).drop("lang_detect")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
    val annotated0 = cfg.classifierModelDir match {
      case Some(mdir) =>
        val model = graft.functions.Perceptron.load(docs.sparkSession, mdir)
        val scores = graft.functions.Perceptron.score(docs, idCol, textCol, model)
          .select(col(idCol).as("_cmid"), col("margin"))
        annotatedQ.join(scores, col(idCol) === col("_cmid"), "left").drop("_cmid")
          .withColumn("classifier_margin", coalesce(col("margin"), lit(0L)))
          .drop("margin")
      case None =>
        annotatedQ.withColumn("classifier_margin",
          graft.functions.LinearClassifier.margin(col(textCol)))
    }

    // 1b. unigram-LM perplexity proxy (optional): corpus-derived,
    // one reused tokenize shuffle (UnigramLm's ReuseExchange shape)
    val annotated1 = cfg.maxAvgNegLogp match {
      case Some(_) =>
        val lm = UnigramLm.score(docs, idCol, textCol)
          .select(col(idCol).as("_lmid"), col("avg_neg_logp"))
        annotated0.join(lm, col(idCol) === col("_lmid"), "left").drop("_lmid")
      case None => annotated0
    }

    // 1c. domain-centrality prior (optional): PageRank over the
    // md5-deterministic domain graph; ranks are a model-sized dim
    // broadcast back onto the corpus
    val annotated = domainEdges match {
      case Some(edges) =>
        val nid = (c: org.apache.spark.sql.Column) =>
          conv(substring(md5(c), 1, 15), 16, 10).cast("long")
        val ranks = PageRank.ranks(
          edges.select(nid(col("src")).as("src"), nid(col("dst")).as("dst")),
          iters = cfg.pagerankIters, tol = cfg.pagerankTol)
        val domRank = edges.select(col("src").as("_dom"))
          .union(edges.select(col("dst").as("_dom"))).distinct()
          .join(ranks, nid(col("_dom")) === col("id"))
          .select(col("_dom"), col("rank").as("domain_rank"))
        annotated1.join(broadcast(domRank),
          col(cfg.domainCol) === col("_dom"), "left").drop("_dom")
      case None => annotated1
    }

    // 1d. blocklist hits (optional): one Aho-Corasick pass per doc —
    // a map-only scan whose phrase automaton rides the task closure —
    // joined back by id
    val annotatedB = cfg.blocklist match {
      case Some(pats) =>
        val hits = graft.functions.Blocklist.annotate(
            docs.select(col(idCol), col(textCol)), idCol, textCol, pats)
          .select(col(idCol).as("_bid"), col("total_hits").as("block_hits"))
        annotated.join(hits, col(idCol) === col("_bid"), "left").drop("_bid")
          .withColumn("block_hits", coalesce(col("block_hits"), lit(0L)))
      case None => annotated
    }

    // 2. filter decisions (kept as a reason column, rows retained);
    // a doc on a domain with no link evidence is not rank-gated
    val filtered0 = annotatedB.withColumn("filter_reason",
      when(col("quality") < cfg.minQuality, "low_quality")
        .when(!col("lang").isin(cfg.allowedLangs: _*), "language")
        .when(col("n_tokens") < cfg.minTokens, "too_short")
        .when(cfg.minClassifierMargin
          .map(t => col("classifier_margin") < t).getOrElse(lit(false)), "classifier")
        .when(cfg.blocklist
          .map(_ => col("block_hits") > cfg.maxBlocklistHits).getOrElse(lit(false)), "blocklist")
        .when(cfg.maxAvgNegLogp
          .map(t => col("avg_neg_logp") > t).getOrElse(lit(false)), "lm_perplexity")
        .when(cfg.minDomainRank
          .map(t => col("domain_rank") < t).getOrElse(lit(false)), "low_rank"))

    // 2b. span-dedup gate (optional): hashed-window duplicated-mass
    // stats over the docs that survived the cheap gates
    val filtered = cfg.spanDedupW match {
      case Some(w) =>
        val surv = filtered0.filter(col("filter_reason").isNull)
          .select(col(idCol), col(textCol))
        val stats = SpanDedup.spanStats(surv, idCol, textCol, w)
          .select(col(idCol).as("_sid"), col("dup_tokens"))
        filtered0.join(stats, col(idCol) === col("_sid"), "left").drop("_sid")
          .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
          .withColumn("filter_reason", coalesce(col("filter_reason"),
            when(col("dup_tokens").cast("double") >
              lit(cfg.spanMaxDupFrac) * col("n_tokens").cast("double"), "span_dup")))
      case None => filtered0
    }

    // 3. dedup the SURVIVORS only (no point hashing filtered docs)
    val survivors = filtered.filter(col("filter_reason").isNull)
      .select(col(idCol), col(textCol))
    val pairs = MinHashLsh.nearDuplicates(survivors, idCol, textCol,
      threshold = cfg.dedupJaccard, cfg = cfg.minhash)
      .select(col("id_a"), col("id_b"))
    val groups = ConnectedComponents.groups(survivors, pairs, idCol)

    // 3b. semantic dedup among the lexical keepers (optional):
    // embedding-level near-dup the shingle hash can't see
    val semVerdicts = (cfg.semDedupThreshold, embeddings) match {
      case (Some(t), Some(emb)) =>
        val keeperIds = filtered.filter(col("filter_reason").isNull)
          .join(groups.filter(col("is_keeper")).select(col(idCol).as("_kid")),
            col(idCol) === col("_kid"))
          .select(col(idCol))
        val keeperEmb = emb.join(keeperIds, Seq(idCol), "left_semi")
        Some(SemDedup.verdicts(keeperEmb, cfg.semDedupDim, t,
          cfg.semDedupSignBits, idCol, vecCol = "embedding")
          .select(col(idCol).as("_semid"), col("kept").as("_sem_kept"),
            col("dup_of").as("sem_dup_of")))
      case _ => None
    }

    // 4. split + keep decision
    val base0 = filtered
      .join(groups.withColumnRenamed(idCol, "_gid"),
        col(idCol) === col("_gid"), "left")
      .drop("_gid")
      .withColumn("split", Sampling.splitLabel(col(idCol), cfg.splits))
      .withColumn("keep",
        col("filter_reason").isNull && coalesce(col("is_keeper"), lit(false)))
    val base = semVerdicts match {
      case Some(v) =>
        base0.join(v, col(idCol) === col("_semid"), "left").drop("_semid")
          .withColumn("keep", col("keep") && coalesce(col("_sem_kept"), lit(true)))
          .drop("_sem_kept")
      case None => base0
    }

    // 5. decontaminate (optional): the kept test split's grams must
    // not leak into train — bloom-flag kept train docs (map-side
    // membership probe; the filter is test-split-sized however large
    // the corpus)
    val deconned = cfg.decontamGramN match {
      case Some(n) =>
        val kept = base.filter(col("keep"))
        // no gram-level distinct: build() distincts the (cheaper,
        // fixed-width) hash positions anyway, so deduping the gram
        // strings first would just add a second, wider shuffle
        val testGrams = kept.filter(col("split") === "test")
          .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
        val bloom = PortableBloom.build(testGrams, "gram", cfg.bloomK, cfg.bloomM)
        val verdicts = PortableBloom.decontaminate(
          kept.filter(col("split") === "train").select(col(idCol), col(textCol)),
          idCol, textCol, bloom, cfg.bloomK, cfg.bloomM, n)
          .select(col(idCol).as("_did"), col("contaminated"))
        base.join(verdicts, col(idCol) === col("_did"), "left").drop("_did")
          .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
          .withColumn("keep", col("keep") && !col("contaminated"))
      case None => base.withColumn("contaminated", lit(false))
    }

    // 6. temperature mix (optional): T=2 rebalance of kept token mass
    // across languages — the domain masses are a broadcast-sized dim,
    // the draw is projection arithmetic
    val mixed = if (cfg.temperatureMix) {
      val dom = deconned.filter(col("keep"))
        .groupBy(col("lang")).agg(sum(col("n_tokens")).as("_dom_toks"))
      val mn = dom.agg(min(col("_dom_toks")).as("_min_toks"))
      deconned.join(broadcast(dom), Seq("lang"), "left").crossJoin(broadcast(mn))
        .withColumn("keep",
          col("keep") && col("_dom_toks").isNotNull &&
            Sampling.temperatureKeepT2(col(idCol), col("_dom_toks"), col("_min_toks")))
        .drop("_dom_toks", "_min_toks")
    } else deconned

    // 7. pack (optional): writer/sequence assignment for the final
    // kept set (null packing columns on dropped rows)
    cfg.packSeqLen match {
      case Some(len) =>
        val packed = Packing.packSequences(
          mixed.filter(col("keep")).select(col(idCol), col("n_tokens")),
          idCol, "n_tokens", len, cfg.packWriters)
          .select(col(idCol).as("_pid"), col("writer"),
            col("cum_before"), col("start_seq"), col("end_seq"))
        mixed.join(packed, col(idCol) === col("_pid"), "left").drop("_pid")
      case None => mixed
    }
  }

  /** One-line corpus report: per (split, decision) counts. */
  def report(curated: DataFrame): DataFrame =
    curated
      .withColumn("decision",
        when(col("keep"), "kept")
          .otherwise(coalesce(col("filter_reason"), lit("near_duplicate"))))
      .groupBy("split", "decision")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("split", "decision")
}
