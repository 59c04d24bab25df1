package graft.etl

import graft.SparkSpec

/** The prompt_template.py DECISION RULES examples, verified verbatim
  * against the deterministic re-expression.
  */
class VariantParserSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = VariantParser.parseVariants(Seq(
    (1L, "Tamatar / Palak / Murgh Yakhni    385/385/465"),
    (2L, "Margherita Pizza 250/350/450"),
    (3L, "Soup 19/35"),
    (4L, "Paneer Tikka .... Market Price"),
    (5L, "Biryani 100-150"),
    (6L, "Plain Dosa .... 75.50"),
    (7L, "Biryani - Choice of Chicken / Mutton / Veg .... 200/250/180"),
    (8L, "Thali Choice of Veg / Non-Veg 150/200")
  ).toDF("doc_id", "line")).collect()

  private def rows(doc: Long) = out.filter(_.getAs[Long]("doc_id") == doc)

  test("slash-separated names map index-to-index onto slash-separated prices") {
    val r = rows(1L).map(r => r.getAs[String]("item_name") -> r.getAs[Double]("price")).toMap
    assert(r == Map("Tamatar" -> 385.0, "Palak" -> 385.0, "Murgh Yakhni" -> 465.0))
  }

  test("one name + three prices become Small/Medium/Large variants") {
    val r = rows(2L)
    assert(r.length == 1 && r.head.getAs[String]("item_name") == "Margherita Pizza")
    assert(r.head.getAs[Double]("small_price") == 250.0)
    assert(r.head.getAs[Double]("medium_price") == 350.0)
    assert(r.head.getAs[Double]("large_price") == 450.0)
    assert(r.head.isNullAt(r.head.fieldIndex("price")))
  }

  test("one name + two prices become Half/Full plate prices") {
    val r = rows(3L).head
    assert(r.getAs[String]("item_name") == "Soup")
    assert(r.getAs[Double]("half_plate_price") == 19.0)
    assert(r.getAs[Double]("full_plate_price") == 35.0)
  }

  test("Market Price yields a null price with the MP display hint") {
    val r = rows(4L).head
    assert(r.getAs[String]("item_name") == "Paneer Tikka")
    assert(r.isNullAt(r.fieldIndex("price")))
    assert(r.getAs[String]("price_display_hint") == "MP")
  }

  test("a price range takes the lower bound and notes the range in the display hint") {
    val r = rows(5L).head
    assert(r.getAs[String]("item_name") == "Biryani" && r.getAs[Double]("price") == 100.0)
    // rule 4: "note range in metadata" — the hint carries the range
    // text, the way the MP arm carries "MP"
    assert(r.getAs[String]("price_display_hint") == "100-150")
  }

  test("plain single price still parses") {
    val r = rows(6L).head
    assert(r.getAs[String]("item_name") == "Plain Dosa" && r.getAs[Double]("price") == 75.5)
  }

  test("Choice of explodes base x option with index-mapped prices (rule 3.4 + label rule 5)") {
    val r = rows(7L).map(r => r.getAs[String]("item_name") -> r.getAs[Double]("price")).toMap
    assert(r == Map("Biryani - Chicken" -> 200.0, "Biryani - Mutton" -> 250.0,
      "Biryani - Veg" -> 180.0))
  }

  test("Choice of without a dash separator still splits") {
    val r = rows(8L).map(r => r.getAs[String]("item_name") -> r.getAs[Double]("price")).toMap
    assert(r == Map("Thali - Veg" -> 150.0, "Thali - Non-Veg" -> 200.0))
  }
}
