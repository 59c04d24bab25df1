package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** D4 — file-source streaming ETL: files dropped in a watched dir are
  * parsed exactly once into the parquet sink, including across a
  * second batch (checkpoint advances).
  */
class StreamingMenuEtlSpec extends SparkSpec {
  import spark.implicits._

  test("streamed files land as parsed items; second drop appends only the new file") {
    val in = Files.createTempDirectory("graft_sin").toString
    val out = Files.createTempDirectory("graft_sout").toString
    val cp = Files.createTempDirectory("graft_scp").toString

    Files.writeString(java.nio.file.Paths.get(in, "m1.txt"),
      "STARTERS\nVegetable Samosa .... $11.00\nPakoras .... $9.50")
    val q1 = StreamingMenuEtl.start(spark, in, out, cp)
    q1.awaitTermination(60000)

    val first = spark.read.parquet(out)
    assert(first.count() == 2)
    assert(first.select("item_name").as[String].collect().toSet ==
      Set("Vegetable Samosa", "Pakoras"))

    Files.writeString(java.nio.file.Paths.get(in, "m2.txt"),
      "Mango Lassi .... $4.00")
    val q2 = StreamingMenuEtl.start(spark, in, out, cp)
    q2.awaitTermination(60000)

    val second = spark.read.parquet(out)
    assert(second.count() == 3) // only the new file was processed
    assert(second.filter($"item_name" === "Mango Lassi").count() == 1)
  }

  test("hierarchy + description columns match the batch window path per micro-batch") {
    val in = Files.createTempDirectory("graft_hin").toString
    val out = Files.createTempDirectory("graft_hout").toString
    val cp = Files.createTempDirectory("graft_hcp").toString

    // subheader, continuation fold, a punctuation separator
    // legitimating a Title-Case header, and category/subcategory reset
    val text = "STARTERS\nVeg Specials:\nGobi Manchurian .... $8.00\n" +
      "crispy florets\n-----\nDesserts\n" +
      "Gulab Jamun .... $4.00 - Classic sweet\nwith rose syrup"
    Files.writeString(java.nio.file.Paths.get(in, "h1.txt"), text)
    StreamingMenuEtl.start(spark, in, out, cp).awaitTermination(60000)

    val streamed = spark.read.parquet(out)
      .select("item_name", "category", "subcategory", "description")
      .as[(String, String, String, String)].collect().toSet

    val lines = text.split("\n", -1).zipWithIndex
      .map { case (l, i) => (1L, i.toLong, l) }.toSeq.toDF("doc_id", "line_no", "line")
    val batch = graft.etl.MenuValidator.validate(graft.etl.MenuParser.parse(lines))
      .filter($"is_valid")
      .select("item_name", "category", "subcategory", "description")
      .as[(String, String, String, String)].collect().toSet

    assert(streamed == batch)
    assert(streamed == Set(
      ("Gobi Manchurian", "Starters", "Veg Specials", "crispy florets"),
      ("Gulab Jamun", "Desserts", "Desserts", "Classic sweet, with rose syrup")))
  }
}
