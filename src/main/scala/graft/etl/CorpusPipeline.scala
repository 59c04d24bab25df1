package graft.etl

import graft.dedup.{ConnectedComponents, MinHashLsh}
import graft.functions.{LangId, Packing, PortableBloom, Sampling, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a pre-training
  * data pipeline actually runs, built entirely from graft's operators
  * so each stage keeps its documented 100 TB shape:
  *
  *   1. ANNOTATE      — quality score, language-ID, token count,
  *                      classifier margin (map-only);
  *   2. FILTER        — quality/language/length gates + optional
  *                      model-based classifier gate (map-only);
  *   3. DEDUP         — MinHash-LSH candidate pairs → verified Jaccard →
  *                      connected components → one keeper per group;
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
        * margin (LinearClassifier) falls below this are filtered with
        * reason "classifier" — the fastText-style filter slot in the
        * recipe. None disables the gate.
        */
      minClassifierMargin: Option[Long] = None,
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
    * group_id, is_keeper, split, keep.
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // 1. annotate (one map pass)
    val annotated = LangId.detected(docs, textCol)
      .withColumn("lang", col("lang_detect.lang")).drop("lang_detect")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("classifier_margin",
        graft.functions.LinearClassifier.margin(col(textCol)))

    // 2. filter decisions (kept as a reason column, rows retained)
    val filtered = annotated.withColumn("filter_reason",
      when(col("quality") < cfg.minQuality, "low_quality")
        .when(!col("lang").isin(cfg.allowedLangs: _*), "language")
        .when(col("n_tokens") < cfg.minTokens, "too_short")
        .when(cfg.minClassifierMargin
          .map(t => col("classifier_margin") < t).getOrElse(lit(false)), "classifier"))

    // 3. dedup the SURVIVORS only (no point hashing filtered docs)
    val survivors = filtered.filter(col("filter_reason").isNull)
      .select(col(idCol), col(textCol))
    val pairs = MinHashLsh.nearDuplicates(survivors, idCol, textCol,
      threshold = cfg.dedupJaccard, cfg = cfg.minhash)
      .select(col("id_a"), col("id_b"))
    val groups = ConnectedComponents.groups(survivors, pairs, idCol)

    // 4. split + keep decision
    val base = filtered
      .join(groups.withColumnRenamed(idCol, "_gid"),
        col(idCol) === col("_gid"), "left")
      .drop("_gid")
      .withColumn("split", Sampling.splitLabel(col(idCol), cfg.splits))
      .withColumn("keep",
        col("filter_reason").isNull && coalesce(col("is_keeper"), lit(false)))

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
