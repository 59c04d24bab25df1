package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** End-to-end distributed re-expression of the reference pipeline
  * (process_menu.py:34 process_single_menu, :120 process_folder /
  * dagster_project/assets/menu_assets.py:12 menu_etl_asset):
  * extract → clean → split lines → parse → validate → shape → sink,
  * plus the batch manifest the reference prints at the end.
  *
  * The reference loops files one at a time in Python; here the whole
  * corpus is one declarative plan. Sinks are partitioned by source
  * (per-file CSVs do not survive 100 TB; partitioned parquet/csv
  * lands the same grouping as directories).
  */
object MenuPipeline {

  case class Result(items: DataFrame, rejects: DataFrame,
                    summary: DataFrame, manifest: DataFrame)

  /** docs: (doc_id, source, text) raw extracted text per document.
    * Sections are propagated inside the per-document line array
    * (MenuParser.sectionedLines): map-only, no window shuffle, and
    * byte-identical to the window formulation.
    */
  def run(docs: DataFrame): Result = {
    graft.functions.PyTitleFunctions.register(docs.sparkSession)
    // Document-level metadata BEFORE the line explode: one map-side
    // expression per doc (process_menu.py:43 restaurant name;
    // menu_models.py:167/:194 detected_currency → per-item fallback).
    val withMeta = docs
      .withColumn("restaurant_name", DocMeta.restaurantName(col("source")))
      .withColumn("detected_currency", DocMeta.detectedCurrency(col("text")))
    val lines = MenuParser.sectionedLines(withMeta)
    val parsed = MenuParser.parseFields(lines)
    val validated = MenuValidator.validate(parsed)

    val items = MenuShaper.shape(
      validated.filter(col("is_valid"))
        .drop("is_valid", "reject_reason", "line", "line_no"),
      detectedCurrency = col("detected_currency"),
      extra = Seq("doc_id", "source", "restaurant_name"))
    val rejects = validated.filter(!col("is_valid"))
      .select(col("doc_id"), col("source"), col("line_no"), col("line"),
        col("reject_reason"))

    val summary = MenuShaper.summary(validated.filter(col("is_valid")))

    val manifest = validated
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_items"),
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
        round(sum(when(col("is_valid"), 1L).otherwise(0L)) /
          greatest(count(lit(1)), lit(1L)).cast("double"), 4)
          .as("extraction_confidence"))

    Result(items, rejects, summary, manifest)
  }

  /** Partitioned sinks (parquet for downstream, csv to mirror the
    * reference's deliverable). Items partition by menu category,
    * rejects by source — the directory-per-group layout that replaces
    * the reference's file-per-menu CSVs at scale (and enables
    * partition pruning for consumers).
    */
  def write(result: Result, outDir: String): Unit = {
    result.items
      .withColumn("category_part", coalesce(col("category"), lit("uncategorized")))
      .write.mode(SaveMode.Overwrite).partitionBy("category_part")
      .parquet(s"$outDir/items_parquet")
    result.items.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outDir/items_csv")
    result.rejects.write.mode(SaveMode.Overwrite).partitionBy("source")
      .parquet(s"$outDir/rejects")
    result.summary.write.mode(SaveMode.Overwrite).parquet(s"$outDir/summary")
    result.manifest.write.mode(SaveMode.Overwrite).parquet(s"$outDir/manifest")
  }
}
