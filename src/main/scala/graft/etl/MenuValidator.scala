package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's pydantic validators as vectorized predicates
  * (reference: restaurant_etl/models/menu_models.py:66 clean_name,
  * :72 validate_currency, :84 validate_price, and the :92
  * has_any_price() admission filter used in llm_parser.py:104).
  *
  * Python validates one object at a time and silently drops failures;
  * here validation is a pair of narrow column expressions over the
  * whole corpus, and rejects are kept with a reason (good-file /
  * bad-file pattern) instead of vanishing. Map-only, codegen'd, no
  * shuffle.
  */
object MenuValidator {

  val PriceCols: Seq[String] = Seq(
    "price", "half_plate_price", "full_plate_price",
    "small_price", "medium_price", "large_price")

  private val currencyWhitelist =
    Seq("$", "₹", "€", "£", "¥", "AUD", "USD", "INR", "EUR", "GBP")

  def hasAnyPrice(df: DataFrame): Column =
    PriceCols.map(c => df(c).isNotNull).reduce(_ || _)

  /** menu_models.py:validate_price — ge=0 and a 100000 sanity cap. */
  private def priceOk(c: Column): Column = c.isNull || (c >= 0 && c <= 100000)

  /** Returns the input with `is_valid` and `reject_reason` columns.
    * Use `.filter($"is_valid")` for the accepted stream and
    * `.filter(!$"is_valid")` for the reject stream.
    */
  def validate(items: DataFrame): DataFrame = {
    val nameClean = regexp_replace(trim(col("item_name")), "\\s+", " ")
    val nameOk = nameClean.isNotNull && length(nameClean) >= 2
    val pricesOk = PriceCols.map(c => priceOk(col(c))).reduce(_ && _)
    val anyPrice = hasAnyPrice(items)
    // validate_currency: whitelist or <=3 chars passes; otherwise nulled.
    val currencyNorm = when(col("currency").isNull, lit(null))
      .when(col("currency").isin(currencyWhitelist: _*) || length(col("currency")) <= 3, col("currency"))
      .otherwise(lit(null))

    items
      .withColumn("item_name", nameClean)
      .withColumn("currency", currencyNorm)
      .withColumn("reject_reason",
        when(!nameOk, "invalid_name")
          .when(!pricesOk, "price_out_of_range")
          .when(!anyPrice, "no_price")
          .otherwise(lit(null)))
      .withColumn("is_valid", col("reject_reason").isNull)
  }

  /** llm_parser.py: extraction_confidence = valid / max(1, total),
    * per document grouping column.
    */
  def extractionConfidence(validated: DataFrame, groupCol: String): DataFrame =
    validated.groupBy(col(groupCol)).agg(
      count(lit(1)).as("total_items"),
      sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_items"),
      round(sum(when(col("is_valid"), 1L).otherwise(0L)) /
        greatest(count(lit(1)), lit(1L)), 4).as("extraction_confidence"))
}
