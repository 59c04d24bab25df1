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

  test("subcategory repeats the category when no subheader appears") {
    assert(parsed.filter($"item_name" === "Vegetable Samosa")
      .head().getAs[String]("subcategory") == "Vegetarian Entrees")
    assert(parsed.filter($"doc_id" === 2L).head().getAs[Any]("subcategory") == null)
  }

  private val hier = Seq(
    (3L, 0L, "STARTERS"),
    (3L, 1L, "Veg Specials:"),
    (3L, 2L, "Gobi Manchurian .... $8.00"),
    (3L, 3L, "Tandoori Bites:"),
    (3L, 4L, "Paneer Tikka .... $9.00"),
    (3L, 5L, "MAINS"),
    (3L, 6L, "Butter Chicken .... $14.00")
  ).toDF("doc_id", "line_no", "line")

  test("two-level hierarchy: nearest subheader wins, a new header resets it") {
    val h = MenuParser.parse(hier).orderBy("line_no")
      .select("item_name", "category", "subcategory").as[(String, String, String)].collect()
    assert(h.toSeq == Seq(
      ("Gobi Manchurian", "Starters", "Veg Specials"),
      ("Paneer Tikka", "Starters", "Tandoori Bites"),
      ("Butter Chicken", "Mains", "Mains")))
  }

  test("wrapped description lines fold into the item, in order, after its own tail") {
    val doc = Seq(
      (4L, 0L, "SNACKS"),
      (4L, 1L, "Samosa .... $5.00 - Fried pastry"),
      (4L, 2L, "with mint chutney"),
      (4L, 3L, "and tamarind dip"),
      (4L, 4L, "MAINS"),
      (4L, 5L, "orphan continuation under a header"),
      (4L, 6L, "Dal Fry .... $9.00")
    ).toDF("doc_id", "line_no", "line")
    val out = MenuParser.parse(doc).orderBy("line_no")
      .select("item_name", "description").as[(String, String)].collect()
    assert(out.toSeq == Seq(
      ("Samosa", "Fried pastry, with mint chutney, and tamarind dip"),
      ("Dal Fry", null)))
  }

  test("Title-Case line with an empty line above is a header (prompt_template rule 2)") {
    val doc = Seq(
      (5L, 0L, "STARTERS"),
      (5L, 1L, "Veg Specials:"),
      (5L, 2L, "Gobi Manchurian .... $8.00"),
      (5L, 3L, ""),
      (5L, 4L, "Desserts"),
      (5L, 5L, "Gulab Jamun .... $4.00")
    ).toDF("doc_id", "line_no", "line")
    val out = MenuParser.parse(doc).orderBy("line_no")
      .select("item_name", "category", "subcategory").as[(String, String, String)].collect()
    assert(out.toSeq == Seq(
      ("Gobi Manchurian", "Starters", "Veg Specials"),
      ("Gulab Jamun", "Desserts", "Desserts")))
  }

  test("Title-Case line with NO blank above stays an unpriced item, not a header") {
    val doc = Seq(
      (6L, 0L, "STARTERS"),
      (6L, 1L, "Gobi Manchurian .... $8.00"),
      (6L, 2L, "Chef Special"),
      (6L, 3L, "Gulab Jamun .... $4.00")
    ).toDF("doc_id", "line_no", "line")
    val out = MenuParser.parse(doc).orderBy("line_no")
      .select("item_name", "category", "price").as[(String, String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("Gobi Manchurian", "Starters", Some(8.0)),
      ("Chef Special", "Starters", None),
      ("Gulab Jamun", "Starters", Some(4.0))))
  }

  test("array path matches the window path on Title-Case/blank-above headers") {
    val text = "STARTERS\nVeg Specials:\nGobi Manchurian .... $8.00\n\nDesserts\n" +
      "Gulab Jamun .... $4.00\nChef Special\nKheer .... $3.00"
    val viaArray = MenuParser.parseFields(MenuParser.sectionedLines(
      Seq((7L, text)).toDF("doc_id", "text")))
      .orderBy("line_no")
      .select("item_name", "category", "subcategory").as[(String, String, String)].collect()
    assert(viaArray.toSeq == Seq(
      ("Gobi Manchurian", "Starters", "Veg Specials"),
      ("Gulab Jamun", "Desserts", "Desserts"),
      ("Chef Special", "Desserts", "Desserts"),
      ("Kheer", "Desserts", "Desserts")))
    val lines = text.split("\n", -1).zipWithIndex.map { case (l, i) => (7L, i.toLong, l) }
      .toSeq.toDF("doc_id", "line_no", "line")
    val viaWindow = MenuParser.parse(lines).orderBy("line_no")
      .select("item_name", "category", "subcategory").as[(String, String, String)].collect()
    assert(viaWindow.toSeq == viaArray.toSeq)
  }

  test("array path (sectionedLines) matches the window path on hierarchy + wrapping") {
    val doc = Seq((3L, "STARTERS\nVeg Specials:\nGobi Manchurian .... $8.00\n" +
      "crispy florets\nin hot garlic sauce\n" +
      "Tandoori Bites:\nPaneer Tikka .... $9.00\nMAINS\nButter Chicken .... $14.00"))
      .toDF("doc_id", "text")
    val viaArray = MenuParser.parseFields(MenuParser.sectionedLines(doc))
      .orderBy("line_no")
      .select("item_name", "category", "subcategory", "description")
      .as[(String, String, String, String)].collect()
    assert(viaArray.toSeq == Seq(
      ("Gobi Manchurian", "Starters", "Veg Specials", "crispy florets, in hot garlic sauce"),
      ("Paneer Tikka", "Starters", "Tandoori Bites", null),
      ("Butter Chicken", "Mains", "Mains", null)))
  }
}
