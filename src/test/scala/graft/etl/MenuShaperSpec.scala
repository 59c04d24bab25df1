package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** get_price_display / get_primary_price / get_summary parity
  * (restaurant_etl/models/menu_models.py).
  */
class MenuShaperSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, java.lang.Double, java.lang.Double, java.lang.Double, String)*) =
    rows.toDF("item_name", "price", "half_plate_price", "full_plate_price", "currency")
      .withColumn("small_price", lit(null).cast("double"))
      .withColumn("medium_price", lit(null).cast("double"))
      .withColumn("large_price", lit(null).cast("double"))
      .withColumn("category", lit(null).cast("string"))
      .withColumn("description", lit(null).cast("string"))
      .withColumn("spice_level", lit(null).cast("string"))
      .withColumn("dietary_tags", array().cast("array<string>"))

  test("display variants: single, portions, none") {
    val d = df(
      ("Single", 12.5, null, null, "$"),
      ("Portions", null, 5.0, 9.0, "₹"),
      ("Nothing", null, null, null, null))
    val out = d.withColumn("pd", MenuShaper.priceDisplay(d))
      .select("item_name", "pd").as[(String, String)].collect().toMap
    assert(out("Single") == "$12.50")
    assert(out("Portions") == "Half: ₹5.00 | Full: ₹9.00")
    assert(out("Nothing") == "No price")
  }

  test("primary price: python or-chain falsiness (0.0 falls through)") {
    val d = df(("Z", 0.0, 4.5, null, "$"))
    assert(d.withColumn("p", MenuShaper.primaryPrice)
      .select("p").as[Double].head() == 4.5)
  }

  test("shape: reference column order + tags joined + currency fallback") {
    val d = df(("Item A", 3.0, null, null, null))
      .withColumn("dietary_tags", array(lit("Vegan"), lit("Gluten-Free")))
    val shaped = MenuShaper.shape(d, detectedCurrency = lit("€"))
    assert(shaped.columns.toSeq == MenuShaper.ColumnOrder)
    val r = shaped.head()
    assert(r.getAs[String]("dietary_tags") == "Vegan, Gluten-Free")
    assert(r.getAs[String]("price_display") == "€3.00")
  }

  test("summary: per-category counts and price stats") {
    val d = df(
      ("A", 2.0, null, null, "$"), ("B", 4.0, null, null, "$"),
      ("C", null, null, null, "$"))
      .withColumn("category", when($"item_name" === "C", lit(null)).otherwise(lit("Mains")))
    val s = MenuShaper.summary(d).orderBy("category").collect()
    val mains = s.find(_.getAs[String]("category") == "Mains").get
    assert(mains.getAs[Long]("total_items") == 2L)
    assert(mains.getAs[Long]("items_with_prices") == 2L)
    assert(mains.getAs[Double]("min_price") == 2.0)
    assert(mains.getAs[Double]("avg_price") == 3.0)
    val unc = s.find(_.getAs[String]("category") == "Uncategorized").get
    assert(unc.getAs[Long]("items_with_prices") == 0L)
  }
}
