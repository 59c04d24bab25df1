package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output shaping + summary analytics, re-expressing the reference's
  * MenuData.to_dataframe (:177) / get_price_display (:103) /
  * get_primary_price (:125) / get_summary (:223), all in
  * restaurant_etl/models/menu_models.py.
  *
  * All formatting is format_string/concat_ws (codegen'd); the summary
  * is a single partial-aggregated groupBy — at 100 TB it shuffles one
  * small row per (category) key, nothing else.
  */
object MenuShaper {

  /** Reference column order (menu_models.py:191-204 to_dataframe). */
  val ColumnOrder: Seq[String] = Seq(
    "item_name", "category", "description", "price_display",
    "price", "half_plate_price", "full_plate_price",
    "small_price", "medium_price", "large_price",
    "currency", "spice_level", "dietary_tags")

  private def part(label: String, c: Column, cur: Column): Column =
    when(c.isNotNull, concat(lit(label + ": "), cur, format_string("%.2f", c)))

  /** get_price_display: "$12.50", or "Half: $5.00 | Full: $9.00" style
    * joins for portion/size prices; "No price" when nothing is set.
    */
  def priceDisplay(df: DataFrame): Column = {
    val cur = coalesce(col("currency"), lit("$"))
    when(col("price").isNotNull, concat(cur, format_string("%.2f", col("price"))))
      .otherwise({
        val parts = concat_ws(" | ",
          part("Half", col("half_plate_price"), cur),
          part("Full", col("full_plate_price"), cur),
          part("Small", col("small_price"), cur),
          part("Medium", col("medium_price"), cur),
          part("Large", col("large_price"), cur))
        when(parts === "", "No price").otherwise(parts)
      })
  }

  /** get_primary_price. The reference uses Python `or`-chaining, so a
    * 0.0 price is falsy and falls through to the next field — kept
    * bug-for-bug via nullif(x, 0.0).
    */
  def primaryPrice: Column = {
    def nz(name: String) = nullif(col(name), lit(0.0))
    coalesce(nz("price"), nz("full_plate_price"), nz("half_plate_price"),
      nz("large_price"), nz("medium_price"), nz("small_price"))
  }

  /** to_dataframe: add price_display, comma-join dietary tags,
    * document-level currency fallback (menu_models.py:194
    * `item.currency or self.detected_currency`), fixed column order.
    * `extra` keeps document-level columns (doc_id, restaurant_name, …)
    * appended after the reference's order.
    */
  def shape(items: DataFrame, detectedCurrency: Column = lit(null),
            extra: Seq[String] = Nil): DataFrame = {
    val withCur = items.withColumn("currency", coalesce(col("currency"), detectedCurrency))
    withCur
      .withColumn("price_display", priceDisplay(withCur))
      .withColumn("dietary_tags",
        when(size(col("dietary_tags")) > 0, array_join(col("dietary_tags"), ", ")))
      .select((ColumnOrder ++ extra).map(col): _*)
  }

  /** get_summary, as a per-category aggregate (the reference returns a
    * single dict; at scale the per-category breakdown IS the summary).
    */
  def summary(items: DataFrame): DataFrame = {
    val anyPrice = MenuValidator.hasAnyPrice(items)
    items
      .withColumn("category_k", coalesce(col("category"), lit("Uncategorized")))
      .withColumn("primary_price", primaryPrice)
      .groupBy(col("category_k").as("category"))
      .agg(
        count(lit(1)).as("total_items"),
        sum(when(anyPrice, 1L).otherwise(0L)).as("items_with_prices"),
        round(min("primary_price"), 2).as("min_price"),
        round(max("primary_price"), 2).as("max_price"),
        round(avg("primary_price"), 2).as("avg_price"))
  }
}
