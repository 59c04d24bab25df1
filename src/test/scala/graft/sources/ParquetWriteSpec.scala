package graft.sources

import graft.SparkSpec

/** Native parquet writer — files must be accepted by Spark's reader,
  * parquet-mr's footer reader, and our own reader pair.
  */
class ParquetWriteSpec extends SparkSpec {
  import ParquetWrite._

  private val n = 500
  private val ids = Array.tabulate(n)(i => i.toLong * 3)
  private val scores = Array.tabulate(n)(i => i * 0.25)
  private val names = Array.tabulate(n)(i => s"name_${i % 37}_$i")

  private def writeTmp(snappy: Boolean): String = {
    val bytes = write(Seq(LongCol("id", ids), DoubleCol("score", scores),
      StringCol("name", names)), snappy)
    val f = java.nio.file.Files.createTempFile("graft_pq_write", ".parquet")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("spark reads our file value-for-value, both codecs") {
    Seq(true, false).foreach { snappy =>
      val rows = spark.read.parquet(writeTmp(snappy))
        .orderBy("id").collect()
      assert(rows.length === n, s"snappy=$snappy")
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) === ids(i))
        assert(r.getDouble(1) === scores(i))
        assert(r.getString(2) === names(i))
      }
    }
  }

  test("parquet-mr accepts the footer: counts, types, codec, statistics") {
    val p = writeTmp(snappy = true)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), new org.apache.hadoop.conf.Configuration()))
    try {
      val f = reader.getFooter
      assert(f.getBlocks.size() === 1)
      assert(f.getBlocks.get(0).getRowCount === n.toLong)
      val c0 = f.getBlocks.get(0).getColumns.get(0)
      assert(c0.getPath.toDotString === "id")
      assert(c0.getCodec.name() === "SNAPPY")
      assert(c0.getStatistics.genericGetMin === 0L)
      assert(c0.getStatistics.genericGetMax === (n - 1).toLong * 3)
      assert(c0.getStatistics.getNumNulls === 0L)
    } finally reader.close()
  }

  test("our own reader pair round-trips the file") {
    val bytes = write(Seq(LongCol("id", ids), StringCol("name", names)))
    val info = ParquetFooter.read(bytes)
    assert(info.valid)
    assert(info.numRows === n.toLong)
    assert(info.leafRepetition("id") === 0) // REQUIRED
    val got = ParquetRead.readColumn(bytes, info, "name")
    assert(got.flatten.toArray.map(_.asInstanceOf[String]).sameElements(names))
  }
}
