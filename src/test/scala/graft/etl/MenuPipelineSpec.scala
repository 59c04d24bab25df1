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

  test("items carry the reference's exact column order") {
    assert(result.items.columns.toSeq == MenuShaper.ColumnOrder)
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
