package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Our ORC bytes consumed by FOREIGN readers: Spark's orc-core reader
  * (the strongest witness a writer can have) and our own OrcRead pair
  * — value-for-value on longs (negative, zigzag-boundary, wide),
  * doubles (subnormal/infinite), and multi-byte UTF-8 strings, plus
  * footer statistics as orc-core reports the row count and our reader
  * reports the claimed min/max/sum.
  */
class OrcWriteSpec extends SparkSpec {
  import spark.implicits._
  import OrcWrite._

  private val n = 3000
  private val longs = Array.tabulate(n)(i =>
    if (i % 97 == 0) -1000000007L * i else (i.toLong - n / 2) * 13)
  private val wides = Array.tabulate(n)(i =>
    if (i % 500 == 0) Long.MaxValue - i else i.toLong % 7)
  private val doubles = Array.tabulate(n)(i => i match {
    case 0 => 0.0
    case 1 => -0.0
    case 2 => Double.MinPositiveValue
    case 3 => Double.MaxValue
    case _ => (i - n / 2) * 0.25
  })
  private val strings = Array.tabulate(n)(i => i % 5 match {
    case 0 => ""
    case 1 => s"plain_$i"
    case 2 => s"héllo_wörld_$i"
    case 3 => s"日本語_$i"
    case _ => "x" * (i % 40)
  })

  private def writeFile(): String = {
    val bytes = OrcWrite.write(Seq(
      LongCol("id", Array.tabulate(n)(_.toLong)),
      LongCol("lv", longs),
      LongCol("wide", wides),
      DoubleCol("dv", doubles),
      StringCol("sv", strings)))
    val dir = Files.createTempDirectory("graft_orcw")
    val f = dir.resolve("ours.orc")
    Files.write(f, bytes)
    f.toString
  }

  test("Spark's orc-core reader consumes our bytes value-for-value") {
    val path = writeFile()
    val rows = spark.read.orc(path).orderBy("id").collect()
    assert(rows.length === n)
    assert(spark.read.orc(path).schema.fieldNames.toSeq ===
      Seq("id", "lv", "wide", "dv", "sv"))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getLong(1) === longs(i), s"lv row $i")
      assert(r.getLong(2) === wides(i), s"wide row $i")
      val d = r.getDouble(3)
      assert(java.lang.Double.doubleToLongBits(d) ===
        java.lang.Double.doubleToLongBits(doubles(i)), s"dv row $i")
      assert(r.getString(4) === strings(i), s"sv row $i")
    }
  }

  test("our own reader round-trips the file, stats included") {
    val path = writeFile()
    val bytes = Files.readAllBytes(Paths.get(path))
    val info = OrcRead.read(bytes)
    assert(info.valid && info.numRows === n.toLong && info.compression === "ZLIB")
    assert(info.stripes.size === 1)
    val root = info.types.head
    assert(root.fieldNames === Vector("id", "lv", "wide", "dv", "sv"))
    def statOf(name: String) = info.stats(root.subtypes(root.fieldNames.indexOf(name)))
    assert(statOf("lv").minLong === Some(longs.min))
    assert(statOf("lv").maxLong === Some(longs.max))
    assert(statOf("lv").sumLong === Some(longs.sum))
    assert(statOf("dv").minDouble === Some(doubles.min))
    assert(statOf("sv").minStr === Some(strings.min) && statOf("sv").maxStr === Some(strings.max))
    assert(OrcRead.readColumn(bytes, info, "lv").map(_.get) === longs.toVector)
    assert(OrcRead.readColumn(bytes, info, "wide").map(_.get) === wides.toVector)
    assert(OrcRead.readColumn(bytes, info, "dv").map(_.get.asInstanceOf[Double])
      .map(java.lang.Double.doubleToLongBits) ===
      doubles.toVector.map(java.lang.Double.doubleToLongBits))
    assert(OrcRead.readColumn(bytes, info, "sv").map(_.get) === strings.toVector)
  }

  test("ragged and null inputs are rejected") {
    intercept[IllegalArgumentException](OrcWrite.write(Seq(
      LongCol("a", Array(1L, 2L)), DoubleCol("b", Array(1.0)))))
    intercept[IllegalArgumentException](OrcWrite.write(Seq(
      StringCol("s", Array("a", null)))))
    intercept[IllegalArgumentException](OrcWrite.write(Seq.empty))
  }
}
