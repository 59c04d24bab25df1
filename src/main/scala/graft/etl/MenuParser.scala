package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, distributed re-expression of the reference's menu
  * parse (reference: restaurant_etl/parsers/llm_parser.py:84 parse_menu — an Azure
  * OpenAI structured-JSON call; the LLM is an external service the
  * engine cannot depend on, so the same output schema is produced by
  * a regexp field extractor that runs inside whole-stage codegen).
  *
  * Input: one row per menu LINE (doc_id, line_no, line). Output: the
  * reference's MenuItem schema (llm_parser.py:26 MENU_JSON_SCHEMA /
  * models/menu_models.py:6 MenuItem).
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

  /** Labelled portion price; the currency symbol is optional — the
    * reference's LLM extracts symbol-less "Half: 5.00" lines too, and
    * their items then rely on the document-level detected_currency
    * fallback (menu_models.py:194). The label anchors the match, so a
    * bare number elsewhere in the line never becomes a price.
    */
  private def money(line: Column, label: String): Column = {
    val m = regexp_extract(line, s"$label\\s*[\\$$₹€£¥]?$priceRe", 1)
    when(m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** First bare price not preceded by a portion/size label. */
  private def singlePrice(line: Column): Column = {
    val labelled = line.rlike("(?i)(half|full|small|medium|large)\\s*:")
    val m = regexp_extract(line, s"[\\$$₹€£¥]$priceRe", 1)
    when(labelled || m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  private[etl] def hasPriceLine(line: Column): Column = line.rlike("[\\$₹€£¥][0-9]")
  private[etl] def isHeaderLine(line: Column): Column =
    !hasPriceLine(line) && line.rlike("^[A-Z0-9 &'\\-]{3,}$")

  /** Title-Case header candidate (prompt_template.py:18-19: "ALL CAPS
    * or Title Casing with empty line above → header"). Pure
    * Title-Case only — every word leads with a capital then
    * lowercase, connectives (and/of/the/&) may stay down; digits and
    * trailing ':' (that's a subheader) disqualify. The blank-above
    * evidence is NOT checked here: a Title-Case line is ambiguous
    * with an unpriced item, so callers must AND this with a
    * had-blank-line-above flag — `parse` carries it as a window lag,
    * `sectionedLines` computes it on the raw array before blank
    * lines are filtered out.
    */
  private[etl] def isTitleHeaderLine(line: Column): Column =
    !hasPriceLine(line) && length(trim(line)) >= 3 &&
      line.rlike("^[A-Z][a-z'’\\-]*(?: (?:[A-Z][a-z'’\\-]*|&|and|of|the))*$")

  /** Subcategory header (prompt_template.py:17-21 — the reference
    * tracks a two-level category/subcategory hierarchy): a no-price
    * header-like line ENDING WITH ':' ("Veg Specials:"), the common
    * way text menus mark a subsection under an ALL-CAPS section.
    */
  private[etl] def isSubheaderLine(line: Column): Column =
    !hasPriceLine(line) && line.rlike("^[A-Za-z][A-Za-z0-9 &'\\-]+:$")
  private[etl] def subheaderName(line: Column): Column =
    initcap(trim(regexp_replace(line, ":\\s*$", "")))

  /** (doc_id, <other cols>, line_no, line, category) from a whole-doc
    * text column: normalize-split the doc and propagate section
    * headers to following lines WITHIN the array, before exploding.
    * Window-free, so it works identically on streaming DataFrames
    * (where the batch path's running-last window is unsupported) —
    * and it is the cheaper plan when each document is one row anyway.
    *
    * Evaluation-count discipline: the normalized line array and the
    * header-index array are each bound ONCE as single-element
    * `transform` lambda variables. Referencing them as plain column
    * expressions instead would make Catalyst re-inline the whole
    * normalize+split regex chain at every use site inside the nested
    * lambdas (common-subexpression elimination does not reach into
    * higher-order functions), turning the per-doc cost from O(lines)
    * regex work into O(lines²) × full-text re-normalization — measured
    * as a 15× slowdown on the sf0.1 pipeline before this binding.
    */
  /** A line the normalizer drops as non-content: empty/1-char or
    * punctuation-only (clean_text.py:13-17's junk rule). Such lines
    * are exactly the "empty line above / visually separated"
    * evidence of prompt_template.py:18-20 — a separator row or a
    * page boundary above a Title-Case line legitimates it as a
    * header, so the evidence must be read BEFORE the lines are
    * dropped.
    */
  private[etl] def isJunkLine(line: Column): Column =
    length(trim(line)) <= 1 || trim(line).rlike("^[\\W_]+$")

  /** Per-line content normalization, identical to what
    * `TextNormalizer.normalize` leaves on each surviving line
    * (clean_text.py: strip, then `..`+ runs → space, then space/tab
    * runs → one space — the join/collapse steps are per-line no-ops
    * because the junk filter already removed every empty line).
    */
  private def normLine(line: Column): Column =
    regexp_replace(regexp_replace(trim(line), "\\.{2,}", " "), "[ \\t]{2,}", " ")

  def sectionedLines(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Split the RAW text (page markers → line breaks first, as the
    // normalizer does) instead of normalizing the whole document up
    // front: whole-doc normalization drops the separator lines whose
    // presence legitimates a Title-Case header, so the junk filter
    // and per-line normalization run HERE, after the evidence is
    // read. Surviving line content is byte-identical to
    // TextNormalizer.normalize's output lines.
    val rawExpr = split(regexp_replace(col(textCol),
      "(?i)-{2,}\\s*Page\\s*\\d+\\s*-{2,}", "\n"), "\n")
    // bind the raw array once, derive kept-line and had-separator-
    // above lists, bind those once each; all regex work happens
    // exactly once per line (see the evaluation-count note above).
    val zipExpr = element_at(transform(array(rawExpr), raw => {
      val idxRaw = when(size(raw) > 0, sequence(lit(0), size(raw) - 1))
        .otherwise(array().cast("array<int>"))
      val keep = filter(idxRaw, i => !isJunkLine(element_at(raw, i + 1)))
      val arrE = transform(keep, i => normLine(element_at(raw, i + 1)))
      val baE = transform(keep, i =>
        when(i > 0, isJunkLine(element_at(raw, i))).otherwise(lit(false)))
      element_at(transform(array(arrE), arr =>
        element_at(transform(array(baE), ba => sectionedZip(arr, ba)), 1)), 1)
    }), 1)
    sectionedExplode(docs, textCol, zipExpr)
  }

  /** The per-document sectioning body over the blank-filtered line
    * array `arr` and its aligned had-blank-above flags `ba` (both
    * already bound once as lambda variables by sectionedLines).
    */
  private def sectionedZip(arr: Column, ba: Column): Column = {
      val idx = when(size(arr) > 0, sequence(lit(0), size(arr) - 1))
        .otherwise(array().cast("array<int>"))
      element_at(transform(
        array(filter(idx, i => isHeaderLine(element_at(arr, i + 1)) ||
          (element_at(ba, i + 1) && isTitleHeaderLine(element_at(arr, i + 1))))), hdrs =>
          element_at(transform(
            array(filter(idx, i => isSubheaderLine(element_at(arr, i + 1)))), subs =>
              element_at(transform(
                array(filter(idx, i => isContinuationLine(element_at(arr, i + 1)))), conts =>
                  transform(
                    filter(idx, i => !array_contains(hdrs, i) && !array_contains(subs, i) &&
                      !array_contains(conts, i)), i => {
                      val h = try_element_at(filter(hdrs, x => x < i), lit(-1))
                      val sh = try_element_at(filter(subs, x => x < i), lit(-1))
                      val cat = when(h.isNotNull, initcap(trim(element_at(arr, h + 1))))
                      // continuation j belongs to item i iff every line
                      // strictly between them is itself a continuation
                      // (prompt_template.py rule 1; matches parse()'s
                      // nearest-non-continuation attribution)
                      val extras = filter(conts, j => j > i &&
                        forall(filter(idx, k => k > i && k < j),
                          k => array_contains(conts, k)))
                      struct(
                        i.cast("long").as("line_no"),
                        element_at(arr, i + 1).as("line"),
                        cat.as("category"),
                        when(sh.isNotNull && (h.isNull || sh > h),
                          subheaderName(element_at(arr, sh + 1))).otherwise(cat).as("subcategory"),
                        when(size(extras) > 0, concat_ws(", ",
                          transform(extras, j => trim(element_at(arr, j + 1)))))
                          .as("desc_extra"))
                    })), 1)), 1)), 1)
  }

  private def sectionedExplode(docs: DataFrame, textCol: String, zipExpr: Column): DataFrame =
    docs
      .withColumn("_e", explode(zipExpr))
      .withColumn("line_no", col("_e.line_no"))
      .withColumn("line", col("_e.line"))
      .withColumn("category", col("_e.category"))
      .withColumn("subcategory", col("_e.subcategory"))
      .withColumn("desc_extra", col("_e.desc_extra"))
      .drop("_e", textCol)

  /** Field extraction only — no header handling; expects a `category`
    * column to already exist (e.g. from sectionedLines) or none. A
    * `desc_extra` column (sectionedLines' folded continuation lines)
    * is appended to the extracted description, matching parse().
    */
  def parseFields(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val f = extractFields(lines, col(lineCol), dropHeaders = false)
    if (f.columns.contains("desc_extra"))
      f.withColumn("description",
        when(col("desc_extra").isNotNull,
          concat_ws(", ", array(col("description"), col("desc_extra"))))
          .otherwise(col("description")))
        .drop("desc_extra")
    else f
  }

  /** Wrapped-description continuation line (prompt_template.py:15-16
    * rule 1 — join broken lines belonging to a single item): no
    * price symbol, no labeled portion price ("Half: 5.00" lines are
    * symbol-less ITEMS under the detected-currency fallback), no
    * numeric price-ish tail (slash lists, ranges), not a
    * header/subheader, and starting lowercase or with a parenthesis.
    */
  private[etl] def isContinuationLine(line: Column): Column =
    !hasPriceLine(line) && !isHeaderLine(line) && !isSubheaderLine(line) &&
      line.rlike("^\\s*[a-z(]") &&
      !line.rlike("(?i)(half|full|small|medium|large)\\s*:") &&
      !line.rlike("[0-9][0-9.,/\\s-]*$")

  /** Parse menu-item lines into the MenuItem schema. Section-header
    * lines (no price, ALL CAPS) become the `category` of the item
    * lines that follow them within the same document; colon-suffixed
    * subsection lines become their `subcategory`, which a NEW section
    * header resets (prompt_template.py:17-21 — nearest header(s)
    * above the item). Where no explicit subcategory applies, the
    * category repeats into `subcategory` (prompt_template.py:21).
    * Short lowercase/parenthesized no-price lines directly under an
    * item fold into its `description`, comma-joined in line order
    * (prompt_template.py:15-16 rule 1; a header boundary detaches
    * them). One window pass carries the running headers and the
    * owning-item attribution — both shuffles are per-document,
    * never corpus-scale.
    */
  def parse(lines: DataFrame, docCol: String = "doc_id", lineNoCol: String = "line_no",
            lineCol: String = "line"): DataFrame = {
    // Junk rows (empty / 1-char / punctuation-only separators — the
    // normalizer's drop rule) are header EVIDENCE for the Title-Case
    // arm (prompt_template.py:18-20), then dropped — attribution and
    // propagation run over content lines only, exactly as
    // sectionedLines' junk-filtered array does.
    val w0 = Window.partitionBy(col(docCol)).orderBy(col(lineNoCol))
    val pre = lines
      .withColumn("_blank_above",
        coalesce(lag(isJunkLine(col(lineCol)), 1).over(w0), lit(false)))
      .filter(!isJunkLine(col(lineCol)))
    val withFields = extractFields(pre, col(lineCol), dropHeaders = true,
      blankAbove = col("_blank_above"))
    // Propagate the most recent section header down to item lines.
    val w = Window.partitionBy(col(docCol)).orderBy(col(lineNoCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Continuations group under the nearest preceding NON-continuation
    // line; only groups anchored at an item row survive, so a stray
    // continuation after a header attaches to nothing.
    val wOwn = Window.partitionBy(col(docCol), col("_own"))
    withFields
      .withColumn("category", last(col("header"), ignoreNulls = true).over(w))
      .withColumn("_hln",
        last(when(col("is_header"), col(lineNoCol)), ignoreNulls = true).over(w))
      .withColumn("_sln",
        last(when(col("is_subheader"), col(lineNoCol)), ignoreNulls = true).over(w))
      .withColumn("_sub", last(col("subheader"), ignoreNulls = true).over(w))
      .withColumn("subcategory",
        when(col("_sln").isNotNull && (col("_hln").isNull || col("_sln") > col("_hln")),
          col("_sub")).otherwise(col("category")))
      .withColumn("_cont", isContinuationLine(col(lineCol)))
      .withColumn("_own",
        last(when(!col("_cont"), col(lineNoCol)), ignoreNulls = true).over(w))
      .withColumn("_extras", array_sort(collect_list(
        when(col("_cont"), struct(col(lineNoCol).as("ln"), trim(col(lineCol)).as("txt"))))
        .over(wOwn)))
      .filter(!col("is_header") && !col("is_subheader") && !col("_cont"))
      .withColumn("description",
        when(size(col("_extras")) > 0, concat_ws(", ",
          concat(array(col("description")), transform(col("_extras"), e => e.getField("txt")))))
          .otherwise(col("description")))
      .drop("is_header", "header", "is_subheader", "subheader",
        "_hln", "_sln", "_sub", "_cont", "_own", "_extras", "_blank_above")
  }

  private def extractFields(lines: DataFrame, line: Column, dropHeaders: Boolean,
                            blankAbove: Column = lit(false)): DataFrame = {
    val isHeader = isHeaderLine(line) || (blankAbove && isTitleHeaderLine(line))

    // Name ends at the dot leader, a portion/size label, or the price
    // itself — dot leaders may already have been collapsed away by
    // TextNormalizer (the reference normalizes before parsing too).
    val rawName = regexp_extract(line,
      "^(.+?)\\s*(?:\\.{2,}|(?i:half|full|small|medium|large)\\s*:|[\\$₹€£¥][0-9])", 1)
    val itemName = regexp_replace(
      trim(when(rawName === "", split(line, "[\\$₹€£¥]").getItem(0)).otherwise(rawName)),
      "\\s+", " ")

    val base =
      if (dropHeaders)
        lines.withColumn("is_header", isHeader)
          .withColumn("header", when(isHeader, initcap(trim(line))))
          .withColumn("is_subheader", isSubheaderLine(line))
          .withColumn("subheader", when(isSubheaderLine(line), subheaderName(line)))
      else lines
    base
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
  }
}
