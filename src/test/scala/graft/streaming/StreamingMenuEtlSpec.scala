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
}
