package graft.sources

import graft.SparkSpec

/** Native column-chunk decode vs Spark's own parquet reader — every
  * column of `part` must match value-for-value in row order.
  */
class ParquetReadSpec extends SparkSpec {

  test("all part columns decode value-for-value against Spark's reader") {
    val p = s"${sf("sf0.001")}/part.parquet"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val info = ParquetFooter.read(bytes)
    assert(info.valid)
    val rows = spark.read.parquet(p).collect()
    def check[T](path: String, get: org.apache.spark.sql.Row => T): Unit = {
      val ours = ParquetRead.readColumn(bytes, info, path)
      assert(ours.size === rows.length, path)
      ours.zip(rows).zipWithIndex.foreach { case ((v, r), i) =>
        assert(v === Some(get(r)), s"$path row $i")
      }
    }
    check("p_partkey", _.getAs[Long]("p_partkey"))
    check("p_size", _.getAs[Int]("p_size"))
    check("p_retailprice", _.getAs[Double]("p_retailprice"))
    check("p_name", _.getAs[String]("p_name"))
    check("p_brand", _.getAs[String]("p_brand"))
    check("p_type", _.getAs[String]("p_type"))
  }

  test("documents.parquet (larger pages, text payloads) decodes identically") {
    val p = s"${sf("sf0.001")}/documents.parquet"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val info = ParquetFooter.read(bytes)
    assert(info.valid)
    val rows = spark.read.parquet(p).select("doc_id", "text").collect()
    val ids = ParquetRead.readColumn(bytes, info, "doc_id")
    val texts = ParquetRead.readColumn(bytes, info, "text")
    assert(ids.size === rows.length)
    ids.zip(rows).foreach { case (v, r) => assert(v === Some(r.getLong(0))) }
    texts.zip(rows).zipWithIndex.foreach { case ((v, r), i) =>
      val want = if (r.isNullAt(1)) None else Some(r.getString(1))
      assert(v === want, s"text row $i")
    }
  }
}
