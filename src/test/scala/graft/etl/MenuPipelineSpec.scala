package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** A9 — end-to-end pipeline over multi-line raw menu docs, incl. the
  * partitioned sinks (mirrors process_menu.py batch mode end-state).
  */
class MenuPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, "src0",
      """--- Page 1 ---
        |STARTERS
        |Vegetable Samosa .... $11.00
        |..
        |Pakoras .... $9.50 [Vegan]
        |MAINS
        |Butter Chicken .... Half: $8.00 Full: $14.00 (Mild)
        |x
        |Bad Price Dish .... $999999.00""".stripMargin),
    (2L, "src1", "Plain Dosa .... $7.25")
  ).toDF("doc_id", "source", "text")

  private lazy val result = MenuPipeline.run(raw)

  test("valid items parsed with categories; bad price rejected with reason") {
    val items = result.items.collect()
    assert(items.length == 4)
    val byName = items.map(r => r.getAs[String]("item_name") -> r).toMap
    assert(byName("Vegetable Samosa").getAs[String]("category") == "Starters")
    assert(byName("Butter Chicken").getAs[String]("category") == "Mains")
    assert(byName("Butter Chicken").getAs[String]("price_display") == "Half: $8.00 | Full: $14.00")
    assert(byName("Pakoras").getAs[String]("dietary_tags") == "Vegan")
    val rejects = result.rejects.collect()
    assert(rejects.length == 1)
    assert(rejects.head.getAs[String]("reject_reason") == "price_out_of_range")
  }

  test("items carry the reference's exact column order, then doc metadata") {
    assert(result.items.columns.toSeq ==
      MenuShaper.ColumnOrder ++ Seq("doc_id", "source", "restaurant_name"))
  }

  test("restaurant_name title-cases the source stem (process_menu.py:43)") {
    val names = result.items.select("source", "restaurant_name").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("src0") == "Src0")
    assert(names("src1") == "Src1")
  }

  test("symbol-less portion lines on a ₹ document render ₹ displays (menu_models.py:194)") {
    val docs = Seq((10L, "great_india_express.pdf",
      """DAAL SPECIALS
        |Daal Makhani .... ₹180.00
        |Daal Tadka .... Half: 90.00 Full: 160.00
        |Plain Rice .... Half: 60.00""".stripMargin))
      .toDF("doc_id", "source", "text")
    val items = MenuPipeline.run(docs).items.collect()
      .map(r => r.getAs[String]("item_name") -> r).toMap
    assert(items("Daal Makhani").getAs[String]("price_display") == "₹180.00")
    // item-level currency was absent; the document's modal ₹ must be
    // recovered through the detected_currency fallback
    assert(items("Daal Tadka").getAs[String]("currency") == "₹")
    assert(items("Daal Tadka").getAs[String]("price_display") == "Half: ₹90.00 | Full: ₹160.00")
    assert(items("Plain Rice").getAs[String]("price_display") == "Half: ₹60.00")
    assert(items("Daal Tadka").getAs[String]("restaurant_name") == "Great India Express")
  }

  test("documents with no currency symbol keep the reference's '$' display default") {
    val docs = Seq((11L, "plain", "Dry Toast .... Half: 2.00"))
      .toDF("doc_id", "source", "text")
    val items = MenuPipeline.run(docs).items.collect()
    assert(items.length == 1)
    assert(items.head.getAs[String]("currency") == null)
    assert(items.head.getAs[String]("price_display") == "Half: $2.00")
  }

  test("manifest aggregates per source with confidence") {
    val m = result.manifest.orderBy("source").collect()
    val src0 = m.find(_.getAs[String]("source") == "src0").get
    assert(src0.getAs[Long]("n_items") == 4L)
    assert(src0.getAs[Long]("n_valid") == 3L)
    assert(src0.getAs[Double]("extraction_confidence") == 0.75)
    val src1 = m.find(_.getAs[String]("source") == "src1").get
    assert(src1.getAs[Long]("n_valid") == 1L)
  }

  test("sinks write parquet + csv; items land category-partitioned") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    MenuPipeline.write(result, dir)
    assert(spark.read.parquet(s"$dir/items_parquet").count() == 4)
    assert(spark.read.option("header", "true").csv(s"$dir/items_csv").count() == 4)
    assert(spark.read.parquet(s"$dir/manifest").count() == 2)
    val parts = new java.io.File(s"$dir/items_parquet").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(parts.exists(_.startsWith("category_part=")), s"no partition dirs: $parts")
    assert(new java.io.File(s"$dir/rejects").listFiles()
      .exists(_.getName.startsWith("source=")))
  }
}
