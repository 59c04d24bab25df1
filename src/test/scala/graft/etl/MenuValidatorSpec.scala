package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pydantic-validator parity (restaurant_etl/models/menu_models.py). */
class MenuValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def items(rows: (String, java.lang.Double, String)*) =
    rows.toDF("item_name", "price", "currency")
      .withColumn("half_plate_price", lit(null).cast("double"))
      .withColumn("full_plate_price", lit(null).cast("double"))
      .withColumn("small_price", lit(null).cast("double"))
      .withColumn("medium_price", lit(null).cast("double"))
      .withColumn("large_price", lit(null).cast("double"))

  test("reject reasons: name length, price cap, no price") {
    val v = MenuValidator.validate(items(
      ("Butter Chicken", 12.5, "$"),
      ("X", 5.0, "$"),
      ("Gold Plate", 150000.0, "$"),
      ("No Price Curry", null, "$")))
      .select("item_name", "reject_reason").as[(String, String)].collect().toMap
    assert(v("Butter Chicken") == null)
    assert(v("X") == "invalid_name")
    assert(v("Gold Plate") == "price_out_of_range")
    assert(v("No Price Curry") == "no_price")
  }

  test("name whitespace normalization mirrors clean_name") {
    val v = MenuValidator.validate(items(("  Butter    Chicken  ", 1.0, "$")))
    assert(v.select("item_name").as[String].head() == "Butter Chicken")
  }

  test("currency whitelist: long unknown symbol nulled, short kept") {
    val v = MenuValidator.validate(items(
      ("A B", 1.0, "DOLLARS"), ("C D", 1.0, "USD"), ("E F", 1.0, "zz")))
      .select("item_name", "currency").as[(String, String)].collect().toMap
    assert(v("A B") == null)   // len > 3, not whitelisted
    assert(v("C D") == "USD")
    assert(v("E F") == "zz")   // <=3 chars passes, as in the reference
  }

  test("extraction confidence = valid / total per doc") {
    val df = items(("Good Item", 1.0, "$"), ("X", 2.0, "$"))
      .withColumn("doc_id", lit(7L))
    val c = MenuValidator.extractionConfidence(MenuValidator.validate(df), "doc_id")
    val r = c.head()
    assert(r.getAs[Long]("total_items") == 2L)
    assert(r.getAs[Long]("valid_items") == 1L)
    assert(r.getAs[Double]("extraction_confidence") == 0.5)
  }
}
