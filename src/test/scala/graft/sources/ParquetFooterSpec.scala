package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native parquet footer walk — checked against the data itself and
  * against parquet-mr's own footer reader on every testdata table.
  */
class ParquetFooterSpec extends SparkSpec {

  private def path(table: String) = s"${sf("sf0.001")}/$table.parquet"

  test("part.parquet: counts, types, codec and statistics match the data") {
    val info = ParquetFooter.readFile(path("part"))
    assert(info.valid)
    assert(info.numRows === 200L)
    assert(info.nRowGroups === 1)
    val byPath = info.columns.map(c => c.path -> c).toMap
    assert(byPath.keySet === Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    info.columns.foreach { c =>
      assert(c.codec === "SNAPPY", c.path)
      assert(c.numValues === 200L, c.path)
      assert(c.nullCount === Some(0L), c.path)
    }
    val df = spark.read.parquet(path("part"))
    val r = df.agg(
      min("p_partkey"), max("p_partkey"), min("p_size"), max("p_size"),
      min("p_retailprice"), max("p_retailprice"), min("p_name"), max("p_name")).head()
    assert(byPath("p_partkey").minNum.get === r.getLong(0).toDouble)
    assert(byPath("p_partkey").maxNum.get === r.getLong(1).toDouble)
    assert(byPath("p_size").minNum.get === r.getInt(2).toDouble)
    assert(byPath("p_size").maxNum.get === r.getInt(3).toDouble)
    assert(byPath("p_retailprice").minNum.get === r.getDouble(4))
    assert(byPath("p_retailprice").maxNum.get === r.getDouble(5))
    assert(byPath("p_name").minStr.get === r.getString(6))
    assert(byPath("p_name").maxStr.get === r.getString(7))
    assert(byPath("p_partkey").ptype === "INT64")
    assert(byPath("p_size").ptype === "INT32")
    assert(byPath("p_name").ptype === "BYTE_ARRAY")
    assert(byPath("p_retailprice").ptype === "DOUBLE")
  }

  test("every testdata table's footer agrees with parquet-mr") {
    val conf = new org.apache.hadoop.conf.Configuration()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = path(t)
      val ours = ParquetFooter.readFile(p)
      assert(ours.valid, t)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf))
      val footer = reader.getFooter
      try {
        assert(ours.numRows === footer.getBlocks.stream.mapToLong(_.getRowCount).sum, t)
        assert(ours.nRowGroups === footer.getBlocks.size(), t)
        assert(ours.createdBy === footer.getFileMetaData.getCreatedBy, t)
        val theirs = footer.getBlocks.get(0).getColumns
        val ourRg0 = ours.columns.filter(_.rowGroup == 0)
        assert(ourRg0.size === theirs.size(), t)
        ourRg0.zipWithIndex.foreach { case (c, i) =>
          val mr = theirs.get(i)
          assert(c.path === mr.getPath.toDotString, s"$t/$i")
          assert(c.numValues === mr.getValueCount, s"$t/${c.path}")
          assert(c.codec === mr.getCodec.name(), s"$t/${c.path}")
          // parquet-mr spells the spec's BYTE_ARRAY types "BINARY"
          val mrType = mr.getPrimitiveType.getPrimitiveTypeName.name() match {
            case "BINARY" => "BYTE_ARRAY"
            case "FIXED_LEN_BINARY" => "FIXED_LEN_BYTE_ARRAY"
            case other => other
          }
          assert(c.ptype === mrType, s"$t/${c.path}")
          val st = mr.getStatistics
          if (st != null && !st.isEmpty) assert(c.nullCount === Some(st.getNumNulls), s"$t/${c.path}")
        }
      } finally reader.close()
    }
  }

  test("malformed footers yield valid=false") {
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path("part")))
    assert(!ParquetFooter.read(good.take(20)).valid)
    assert(!ParquetFooter.read("PAR1junkjunkPAR1".getBytes("UTF-8")).valid)
    val badLen = good.clone()
    badLen(good.length - 8) = 0x7f // lying footer length
    badLen(good.length - 7) = 0x7f.toByte
    assert(!ParquetFooter.read(badLen).valid)
  }
}
