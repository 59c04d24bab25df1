package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fidelity against the reference's OWN extraction output
  * (/root/reference/output/great_india.csv — read-only): reconstruct
  * menu text from the items the reference's LLM extracted, run the
  * graft pipeline on it, and require the same
  * (item_name, category, price, price_display) back out. This pins
  * the deterministic parser to the reference's observed behavior, not
  * just to our own fixtures.
  */
class ReferenceFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val refCsv = "/root/reference/output/great_india.csv"

  private lazy val reference = spark.read
    .option("header", "true").option("quote", "\"").option("escape", "\"")
    .csv(refCsv)
    .filter(col("price").isNotNull && col("category").isNotNull) // single-price rows reconstruct cleanly
    .select(col("item_name"), col("category"), col("price").cast("double"),
      col("price_display"))
    .limit(30)
    .collect()

  test("pipeline reproduces the reference's extraction on its own menu") {
    assume(new java.io.File(refCsv).exists())
    // rebuild a menu document: section header per category, then lines
    val byCat = reference.groupBy(_.getAs[String]("category")).toSeq.sortBy(_._1)
    val text = byCat.map { case (cat, rows) =>
      cat.toUpperCase + "\n" + rows.map { r =>
        f"${r.getAs[String]("item_name")} .... $$${r.getAs[Double]("price")}%.2f"
      }.mkString("\n")
    }.mkString("\n")

    val docs = Seq((1L, "great_india.pdf", text)).toDF("doc_id", "source", "text")
    val rows = MenuPipeline.run(docs).items.collect()
    val items = rows.map(r => r.getAs[String]("item_name") -> r).toMap

    // process_menu.py:43 — restaurant name from the file stem
    assert(rows.forall(_.getAs[String]("restaurant_name") == "Great India"))

    reference.foreach { ref =>
      val name = ref.getAs[String]("item_name")
      val got = items.get(name)
      assert(got.isDefined, s"reference item '$name' not re-extracted")
      // case-insensitive: header reconstruction upper-cases the menu
      // section and initcap lowercases mid-word capitals ("Non-Vegetarian"
      // -> "Non-vegetarian"); the section attribution is what matters
      assert(got.get.getAs[String]("category").equalsIgnoreCase(ref.getAs[String]("category")),
        s"category mismatch for $name")
      assert(got.get.getAs[Double]("price") == ref.getAs[Double]("price"),
        s"price mismatch for $name")
      assert(got.get.getAs[String]("price_display") == ref.getAs[String]("price_display"),
        s"display mismatch for $name")
    }
    assert(items.size == reference.length)
  }

  test("multi-price portions (PNF menu) reproduce the reference display") {
    val pnfCsv = "/root/reference/output/PNF-Food-Drinks.csv"
    assume(new java.io.File(pnfCsv).exists())
    val ref = spark.read
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(pnfCsv)
      .filter(col("category").isNotNull && col("price").isNull &&
        (col("half_plate_price").isNotNull || col("small_price").isNotNull))
      .select("item_name", "category", "price_display",
        "half_plate_price", "full_plate_price", "small_price", "medium_price", "large_price")
      .collect()
    assume(ref.nonEmpty)

    def part(label: String, v: String) =
      Option(v).map(p => s"$label: $$${"%.2f".format(p.toDouble)}")
    val text = ref.groupBy(_.getAs[String]("category")).toSeq.sortBy(_._1).map {
      case (cat, rows) =>
        cat.toUpperCase + "\n" + rows.map { r =>
          val parts = Seq(
            part("Half", r.getAs[String]("half_plate_price")),
            part("Full", r.getAs[String]("full_plate_price")),
            part("Small", r.getAs[String]("small_price")),
            part("Medium", r.getAs[String]("medium_price")),
            part("Large", r.getAs[String]("large_price"))).flatten
          s"${r.getAs[String]("item_name")} .... ${parts.mkString(" ")}"
        }.mkString("\n")
    }.mkString("\n")

    val docs = Seq((1L, "PNF-Food-Drinks.pdf", text)).toDF("doc_id", "source", "text")
    val rows = MenuPipeline.run(docs).items.collect()
    val items = rows.map(r => r.getAs[String]("item_name") -> r).toMap
    // .title() on the stem: "PNF-Food-Drinks" → "Pnf-Food-Drinks"
    assert(rows.forall(_.getAs[String]("restaurant_name") == "Pnf-Food-Drinks"))
    ref.foreach { r =>
      val name = r.getAs[String]("item_name")
      val got = items.get(name)
      assert(got.isDefined, s"'$name' not re-extracted")
      assert(got.get.getAs[String]("price_display") == r.getAs[String]("price_display"),
        s"display mismatch for $name: ${got.get.getAs[String]("price_display")}")
      assert(got.get.getAs[String]("category").equalsIgnoreCase(r.getAs[String]("category")))
    }
  }
}
