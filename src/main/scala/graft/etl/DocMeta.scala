package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document-level metadata the reference derives outside the per-item
  * parse: the restaurant name from the source file stem
  * (reference: process_menu.py:43 `file_path.stem.replace("_", " ")
  * .title()`) and the document's primary currency
  * (reference: restaurant_etl/models/menu_models.py:167
  * `detected_currency`, consumed as the per-item fallback at :194
  * `item.currency or self.detected_currency`).
  *
  * Both are pure column expressions (regexp + higher-order array
  * functions) — map-only, codegen'd, no shuffle: at 100 TB these ride
  * along with the document scan for free.
  */
object DocMeta {

  /** Symbols the parser recognizes, in fixed tie-break priority. */
  val CurrencySymbols: Seq[String] = Seq("$", "₹", "€", "£", "¥")

  /** Source path → display name: basename, strip last extension,
    * underscores → spaces, title-case with EXACT Python `.title()`
    * semantics (graft.functions.PyTitle — re-capitalizes after any
    * uncased character, so hyphens, apostrophes and digits all reset:
    * "great_india" → "Great India", "PNF-Food-Drinks.pdf" →
    * "Pnf-Food-Drinks", "bob's_cafe_2go" → "Bob'S Cafe 2Go", matching
    * process_menu.py:43 byte-for-byte). Callers must have called
    * `PyTitleFunctions.register(spark)` (MenuPipeline.run does).
    */
  def restaurantName(source: Column): Column = {
    val base = regexp_extract(source, "([^/]*)$", 1)
    val stem = regexp_replace(base, "\\.[^.]*$", "")
    val spaced = regexp_replace(stem, "_", " ")
    graft.functions.PyTitleFunctions.pyTitle(spaced)
  }

  /** Modal currency symbol of the raw document text (argmax of symbol
    * occurrence counts; ties break toward the front of
    * [[CurrencySymbols]]; null when no symbol occurs). This is the
    * engine's realization of the reference's LLM-reported
    * `detected_currency`: deterministic, and computed per document
    * BEFORE line explode so it is one map-side expression.
    *
    * The count array is bound once as a lambda variable before the
    * argmax — a `when`-chain fold over the raw count expressions would
    * re-inline (and re-split the text for) every count O(symbols)
    * times per row, which profiling showed dominating the whole menu
    * pipeline at sf0.1.
    */
  def detectedCurrency(text: Column): Column = {
    val counts = array(CurrencySymbols.map { s =>
      size(split(text, java.util.regex.Pattern.quote(s), -1)) - lit(1)
    }: _*)
    element_at(transform(array(counts), cnts => {
      // argmax via struct max: (count, -index) orders ties toward the
      // earlier symbol; map the winning index back to its symbol.
      val best = array_max(transform(sequence(lit(0), lit(CurrencySymbols.length - 1)),
        i => struct(element_at(cnts, i + 1).as("c"), (-i).as("ni"))))
      when(best.getField("c") > 0,
        element_at(typedLit(CurrencySymbols), -best.getField("ni") + 1))
    }), 1)
  }
}
