package graft.sources

import graft.SparkSpec
import graft.etl.MenuPipeline
import java.nio.file.{Files, Paths}

/** End-to-end: files on disk → binaryFile source → pipeline, the
  * reference's actual input surface (input/ folder of menus).
  */
class BinaryDocsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_docs")
    Files.writeString(d.resolve("great_india.txt"),
      "STARTERS\nVegetable Samosa .... $11.00\nPakoras .... $9.50")
    Files.writeString(d.resolve("pnf_drinks.txt"),
      "DRINKS\nMango Lassi .... Small: $3.00 Large: $5.00")
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("sub/nested.txt"), "Nested Dosa .... $7.00")
    Files.write(d.resolve("menu.pdf"), Array[Byte](0x25, 0x50, 0x44, 0x46)) // %PDF
    d.toString
  }

  test("binaryFile read: recursive, routed, stable ids") {
    val docs = BinaryDocs.read(spark, dir)
    assert(docs.count() == 4)
    val routes = docs.select("source", "extractor").as[(String, String)].collect().toMap
    assert(routes("menu.pdf") == "pdf_extractor")
    assert(routes("great_india.txt") == "unsupported") // txt not in the reference's map
    assert(docs.select("doc_id").distinct().count() == 4)
  }

  test("file corpus flows into the menu pipeline") {
    val text = BinaryDocs.asText(
      BinaryDocs.read(spark, dir, glob = "*.txt"))
    val result = MenuPipeline.run(text)
    val items = result.items.collect()
    assert(items.length == 4) // Samosa, Pakoras, Lassi, Dosa
    val lassi = items.find(_.getAs[String]("item_name") == "Mango Lassi").get
    assert(lassi.getAs[String]("category") == "Drinks")
    assert(lassi.getAs[String]("price_display") == "Small: $3.00 | Large: $5.00")
  }
}
