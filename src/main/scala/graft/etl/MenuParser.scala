package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, distributed re-expression of the reference's menu
  * parse (reference: restaurant_etl/parsers/llm_parser.py — an Azure
  * OpenAI structured-JSON call; the LLM is an external service the
  * engine cannot depend on, so the same output schema is produced by
  * a regexp field extractor that runs inside whole-stage codegen).
  *
  * Input: one row per menu LINE (doc_id, line_no, line). Output: the
  * reference's MenuItem schema (llm_parser.py:MENU_JSON_SCHEMA /
  * models/menu_models.py:MenuItem).
  *
  * Line grammar (what a text-extracted menu looks like):
  *   "Butter Chicken .... $12.50"
  *   "Samosa .... Half: $5.00 Full: $9.00"
  *   "Pizza .... Small: $8.00 Medium: $10.00 Large: $12.00"
  *   "PANEER SPECIALS"                      (section header → category)
  * Optional decorations: "(Hot)" spice level, "[Vegan]" dietary tags,
  * "- description" tail.
  *
  * Scale: pure map-side expression work — no shuffle except the
  * optional section propagation, which windows by (doc_id) and is
  * bounded by lines-per-document, never corpus size.
  */
object MenuParser {

  private val priceRe = "([0-9]+(?:\\.[0-9]+)?)"

  private def money(line: Column, label: String): Column = {
    val m = regexp_extract(line, s"$label\\s*[\\$$₹€£¥]$priceRe", 1)
    when(m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** First bare price not preceded by a portion/size label. */
  private def singlePrice(line: Column): Column = {
    val labelled = line.rlike("(?i)(half|full|small|medium|large)\\s*:")
    val m = regexp_extract(line, s"[\\$$₹€£¥]$priceRe", 1)
    when(labelled || m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** Parse menu-item lines into the MenuItem schema. Section-header
    * lines (no price, ALL CAPS) become the `category` of the item
    * lines that follow them within the same document, mirroring how
    * the reference's LLM attributes categories to sections.
    */
  def parse(lines: DataFrame, docCol: String = "doc_id", lineNoCol: String = "line_no",
            lineCol: String = "line"): DataFrame = {
    val line = col(lineCol)
    val hasPrice = line.rlike("[\\$₹€£¥][0-9]")
    val isHeader = !hasPrice && line.rlike("^[A-Z0-9 &'\\-]{3,}$")

    // Name ends at the dot leader, a portion/size label, or the price
    // itself — dot leaders may already have been collapsed away by
    // TextNormalizer (the reference normalizes before parsing too).
    val rawName = regexp_extract(line,
      "^(.+?)\\s*(?:\\.{2,}|(?i:half|full|small|medium|large)\\s*:|[\\$₹€£¥][0-9])", 1)
    val itemName = regexp_replace(
      trim(when(rawName === "", split(line, "[\\$₹€£¥]").getItem(0)).otherwise(rawName)),
      "\\s+", " ")

    val withFields = lines
      .withColumn("is_header", isHeader)
      .withColumn("header", when(isHeader, initcap(trim(line))))
      .withColumn("item_name", when(isHeader, lit(null)).otherwise(itemName))
      .withColumn("description", {
        val d = regexp_extract(line, "-\\s+([^\\[\\(]+?)\\s*$", 1)
        when(d === "", lit(null)).otherwise(trim(d))
      })
      .withColumn("price", singlePrice(line))
      .withColumn("half_plate_price", money(line, "(?i)half:"))
      .withColumn("full_plate_price", money(line, "(?i)full:"))
      .withColumn("small_price", money(line, "(?i)small:"))
      .withColumn("medium_price", money(line, "(?i)medium:"))
      .withColumn("large_price", money(line, "(?i)large:"))
      .withColumn("currency", {
        val c = regexp_extract(line, "([\\$₹€£¥])", 1)
        when(c === "", lit(null)).otherwise(c)
      })
      .withColumn("spice_level", {
        val s = regexp_extract(line, "\\((Mild|Medium|Hot|Very Hot)\\)", 1)
        when(s === "", lit(null)).otherwise(s)
      })
      .withColumn("dietary_tags",
        regexp_extract_all(line, lit("\\[(Vegan|Vegetarian|Gluten-Free|Halal|Jain)\\]"), lit(1)))

    // Propagate the most recent section header down to item lines.
    val w = Window.partitionBy(col(docCol)).orderBy(col(lineNoCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withFields
      .withColumn("category", last(col("header"), ignoreNulls = true).over(w))
      .filter(!col("is_header"))
      .drop("is_header", "header")
  }
}
