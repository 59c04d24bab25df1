package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's "BetterVersion" parse rules re-expressed as
  * deterministic column logic (reference:
  * BetterVersion/prompt_template.py DECISION RULES — the LLM prompt's
  * variant/price-mapping contract):
  *
  *  - slash-separated NAMES with the same count of slash-separated
  *    PRICES → one item per (name_i, price_i) (rule 3, "Tamatar /
  *    palak / murgh 385/385/465");
  *  - one name + 3 prices → Small/Medium/Large size variants
  *    (rule 3, "Margherita Pizza 250/350/450");
  *  - one name + 2 prices → half_plate/full_plate (rule 3,
  *    "Soup 19/35");
  *  - a "Choice of" option list whose count matches the price list →
  *    base item × each choice as separate items, prices mapped by
  *    index, variant label appended to the name (rule 3 bullet 4 +
  *    rule 5, "Biryani - Choice of Chicken / Mutton 200/250" →
  *    "Biryani - Chicken":200, "Biryani - Mutton":250);
  *  - "Market Price" / "MP" → null price, price_display "MP"
  *    (rule 4);
  *  - a price RANGE "100-150" → lower bound as price, the range text
  *    noted in `price_display_hint` (rule 4: "note range in
  *    metadata").
  *
  * Everything is arrays + transform + one explode: map-side,
  * whole-stage-codegen'd, no shuffle — the LLM's judgment replaced by
  * the prompt's own deterministic rules at engine speed.
  */
object VariantParser {

  private val priceNum = "[0-9]+(?:\\.[0-9]+)?"

  /** Parse lines of shape `names .... prices` into exploded menu
    * items. Input: (any cols) + `lineCol`; output adds `item_name`,
    * `price`, `half_plate_price`, `full_plate_price`, `small_price`,
    * `medium_price`, `large_price`, `price_display_hint` (null unless
    * "MP") and drops the raw line column.
    */
  def parseVariants(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val line = col(lineCol)

    val isMp = line.rlike("(?i)market\\s+price|\\bMP\\s*$")
    val rangeLow = regexp_extract(line, s"($priceNum)\\s*-\\s*$priceNum\\s*$$", 1)
    // rule 4: "if a price is a range 100-150, take the lower bound as
    // price AND note range in metadata" — the note rides in
    // price_display_hint as the range text, like the MP arm's "MP".
    val rangeText = regexp_extract(line, s"($priceNum\\s*-\\s*$priceNum)\\s*$$", 1)

    // trailing slash-separated price list ("385/385/465" or "19/35")
    val priceList = regexp_extract(line, s"($priceNum(?:\\s*/\\s*$priceNum)*)\\s*$$", 1)
    val prices = when(priceList === "", array().cast("array<double>"))
      .otherwise(transform(split(priceList, "/"), p => trim(p).cast("double")))

    // name part = line minus the trailing price list / MP / range tail,
    // minus dot leaders; slash-separated names are variants
    val nameTail = s"(?:$priceNum(?:\\s*/\\s*$priceNum)*|$priceNum\\s*-\\s*$priceNum|(?i:market\\s+price)|MP)\\s*$$"
    val namePart = trim(regexp_replace(regexp_replace(line, nameTail, ""), "[.\\s]+$", ""))
    val names = filter(transform(split(namePart, "/"), n => trim(n)), n => length(n) > 0)

    val nn = size(names)
    val np = size(prices)
    val nullD = lit(null).cast("double")

    // "Choice of" option list (rule 3 bullet 4): base × options,
    // prices mapped by index; label appended per rule 5.
    val choiceRe = "(?i)^(.+?)\\s*[-–]?\\s*choice\\s+of\\s+(.+)$"
    val choiceBase = trim(regexp_extract(namePart, choiceRe, 1))
    val choices = filter(transform(split(regexp_extract(namePart, choiceRe, 2), "/"),
      n => trim(n)), n => length(n) > 0)
    val nc = size(choices)

    // one output struct per item; multi-name lines explode by index
    val item = (name: Column, price: Column, half: Column, full: Column,
                sm: Column, md: Column, lg: Column, hint: Column) =>
      struct(name.as("item_name"), price.as("price"),
        half.as("half_plate_price"), full.as("full_plate_price"),
        sm.as("small_price"), md.as("medium_price"), lg.as("large_price"),
        hint.as("price_display_hint"))

    val items =
      when(isMp,
        array(item(namePart, nullD, nullD, nullD, nullD, nullD, nullD, lit("MP"))))
      .when(rangeLow =!= "",
        array(item(namePart, rangeLow.cast("double"), nullD, nullD, nullD, nullD, nullD,
          rangeText)))
      .when(choiceBase =!= "" && nc === np && np >= 1,
        transform(sequence(lit(0), np - 1), i =>
          item(concat(choiceBase, lit(" - "), element_at(choices, i + 1)),
            element_at(prices, i + 1),
            nullD, nullD, nullD, nullD, nullD, lit(null).cast("string"))))
      .when(nn === np && np > 1,
        transform(sequence(lit(0), np - 1), i =>
          item(element_at(names, i + 1), element_at(prices, i + 1),
            nullD, nullD, nullD, nullD, nullD, lit(null).cast("string"))))
      .when(nn === 1 && np === 3,
        array(item(element_at(names, 1), nullD, nullD, nullD,
          element_at(prices, 1), element_at(prices, 2), element_at(prices, 3),
          lit(null).cast("string"))))
      .when(nn === 1 && np === 2,
        array(item(element_at(names, 1), nullD,
          element_at(prices, 1), element_at(prices, 2),
          nullD, nullD, nullD, lit(null).cast("string"))))
      .when(nn === 1 && np === 1,
        array(item(element_at(names, 1), element_at(prices, 1),
          nullD, nullD, nullD, nullD, nullD, lit(null).cast("string"))))
      .otherwise( // ambiguous → keep the raw name, no invented prices
        array(item(namePart, nullD, nullD, nullD, nullD, nullD, nullD,
          lit(null).cast("string"))))

    lines
      .withColumn("_item", explode(items))
      .select((lines.columns.filter(_ != lineCol).map(col) :+ col("_item.*")): _*)
  }
}
