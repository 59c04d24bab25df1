package graft.etl

import graft.dedup.{ConnectedComponents, MinHashLsh}
import graft.functions.{LangId, Sampling, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a pre-training
  * data pipeline actually runs, built entirely from graft's operators
  * so each stage keeps its documented 100 TB shape:
  *
  *   1. ANNOTATE  — quality score, language-ID, token count (map-only);
  *   2. FILTER    — quality/language/length gates (map-only);
  *   3. DEDUP     — MinHash-LSH candidate pairs → verified Jaccard →
  *                  connected components → one keeper per group;
  *   4. SPLIT     — deterministic md5-bucket train/val/test labels.
  *
  * Output keeps EVERY input row with its annotations and decisions
  * (kept/filtered reason, group id, keeper flag, split) — the
  * good-file/bad-file pattern at corpus scale: downstream consumers
  * take `curated.filter($"keep")`, audits take the rest.
  */
object CorpusPipeline {

  case class Config(
      minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en"),
      minTokens: Int = 10,
      dedupJaccard: Double = 0.8,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      minhash: MinHashLsh.Config = MinHashLsh.Config())

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

    // 2. filter decisions (kept as a reason column, rows retained)
    val filtered = annotated.withColumn("filter_reason",
      when(col("quality") < cfg.minQuality, "low_quality")
        .when(!col("lang").isin(cfg.allowedLangs: _*), "language")
        .when(col("n_tokens") < cfg.minTokens, "too_short"))

    // 3. dedup the SURVIVORS only (no point hashing filtered docs)
    val survivors = filtered.filter(col("filter_reason").isNull)
      .select(col(idCol), col(textCol))
    val pairs = MinHashLsh.nearDuplicates(survivors, idCol, textCol,
      threshold = cfg.dedupJaccard, cfg = cfg.minhash)
      .select(col("id_a"), col("id_b"))
    val groups = ConnectedComponents.groups(survivors, pairs, idCol)

    // 4. split + final keep decision
    filtered
      .join(groups.withColumnRenamed(idCol, "_gid"),
        col(idCol) === col("_gid"), "left")
      .drop("_gid")
      .withColumn("split", Sampling.splitLabel(col(idCol), cfg.splits))
      .withColumn("keep",
        col("filter_reason").isNull && coalesce(col("is_keeper"), lit(false)))
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
