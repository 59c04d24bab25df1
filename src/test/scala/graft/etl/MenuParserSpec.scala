package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Parser grammar coverage incl. section-header category propagation —
  * semantics the reference gets from its LLM call
  * (restaurant_etl/parsers/llm_parser.py schema).
  */
class MenuParserSpec extends SparkSpec {
  import spark.implicits._

  private val menu = Seq(
    (1L, 0L, "VEGETARIAN ENTREES"),
    (1L, 1L, "Vegetable Samosa .... $11.00 [Vegetarian] - Deep-fried pastry"),
    (1L, 2L, "Paneer Tikka .... Half: $5.50 Full: $9.00 (Hot)"),
    (1L, 3L, "DESSERTS & DRINKS"),
    (1L, 4L, "Mango Lassi .... Small: $3.00 Medium: $4.00 Large: $5.00"),
    (2L, 0L, "Plain   Naan .... ₹45.50")
  ).toDF("doc_id", "line_no", "line")

  private lazy val parsed = MenuParser.parse(menu).orderBy("doc_id", "line_no")

  test("single price + dietary tag + description") {
    val r = parsed.filter($"item_name" === "Vegetable Samosa").head()
    assert(r.getAs[Double]("price") == 11.0)
    assert(r.getAs[scala.collection.Seq[String]]("dietary_tags").toSeq == Seq("Vegetarian"))
    assert(r.getAs[String]("description") == "Deep-fried pastry")
    assert(r.getAs[String]("currency") == "$")
    assert(r.getAs[String]("category") == "Vegetarian Entrees")
  }

  test("half/full prices + spice level; no bare price captured") {
    val r = parsed.filter($"item_name" === "Paneer Tikka").head()
    assert(r.getAs[Any]("price") == null)
    assert(r.getAs[Double]("half_plate_price") == 5.5)
    assert(r.getAs[Double]("full_plate_price") == 9.0)
    assert(r.getAs[String]("spice_level") == "Hot")
  }

  test("size prices + category switches at second header") {
    val r = parsed.filter($"item_name" === "Mango Lassi").head()
    assert(r.getAs[Double]("small_price") == 3.0)
    assert(r.getAs[Double]("medium_price") == 4.0)
    assert(r.getAs[Double]("large_price") == 5.0)
    assert(r.getAs[String]("category") == "Desserts & Drinks")
  }

  test("whitespace-normalized name, unicode currency, headerless doc") {
    val r = parsed.filter($"doc_id" === 2L).head()
    assert(r.getAs[String]("item_name") == "Plain Naan")
    assert(r.getAs[String]("currency") == "₹")
    assert(r.getAs[Double]("price") == 45.5)
    assert(r.getAs[Any]("category") == null)
  }

  test("header lines are not emitted as items") {
    assert(parsed.count() == 4)
  }
}
