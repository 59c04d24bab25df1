package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native ORC reader vs the reference implementation ON the Spark
  * classpath: Spark writes ORC through orc-core, our reader decodes
  * the same bytes with no ORC library — footer metadata, statistics,
  * and whole columns value-for-value, in all three supported codecs.
  * The fixture exercises both string encodings (low-cardinality →
  * DICTIONARY_V2, unique → DIRECT_V2), all four RLEv2 integer
  * sub-encodings (runs, random, monotonic, outlier-patched), nulls
  * through PRESENT streams, float/double/boolean columns.
  */
class OrcReadSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame = {
    val rows = (0 until 2000).map { i =>
      val id = i.toLong
      (id,
        id * 1000L,                                   // monotonic → DELTA
        if (i % 7 == 0) 42L else (id * 2654435761L) % 100000L, // mixed → DIRECT/PATCHED
        if (i % 100 == 0) 1000000000L + i else i % 16L, // outliers → PATCHED_BASE
        s"cat_${i % 5}",                              // 5 distinct → DICTIONARY_V2
        f"unique_$i%05d_${i * 37}",                   // unique → DIRECT_V2
        if (i % 11 == 0) None else Some(s"val$i"),    // nulls → PRESENT
        i * 0.25,                                      // exact double
        (i % 13).toFloat / 4.0f,
        i % 3 == 0,
        (i % 128 - 64).toByte)
    }
    rows.toDF("id", "mono", "mixed", "outlier", "dict_s", "direct_s",
      "null_s", "d", "f", "b", "y").repartition(1).sortWithinPartitions("id")
  }

  private def writeOrc(df: DataFrame, codec: String): String = {
    val dir = Files.createTempDirectory(s"graft_orc_$codec").toString
    df.write.mode("overwrite").option("compression", codec).orc(dir)
    Files.list(Paths.get(dir)).iterator.asScala
      .map(_.toString).filter(_.endsWith(".orc")).toSeq match {
      case Seq(one) => one
      case other => fail(s"expected one orc file, got $other")
    }
  }

  private val codecs = Seq("zlib" -> "ZLIB", "snappy" -> "SNAPPY", "zstd" -> "ZSTD")

  codecs.foreach { case (codec, codecName) =>
    test(s"$codec: footer, stats and every column decode value-for-value vs Spark") {
      val df = fixture
      val path = writeOrc(df, codec)
      val bytes = Files.readAllBytes(Paths.get(path))
      val info = OrcRead.read(bytes)
      assert(info.valid, "footer walk must succeed")
      assert(info.compression === codecName)
      assert(info.numRows === 2000L)
      assert(info.stripes.map(_.numRows).sum === 2000L)
      assert(info.types.head.kind === 12, "root struct")
      assert(info.types.head.fieldNames === df.schema.fieldNames.toVector)

      // file statistics vs the data (column ids are root subtypes)
      val root = info.types.head
      def statOf(name: String) = info.stats(root.subtypes(root.fieldNames.indexOf(name)))
      assert(statOf("id").minLong === Some(0L) && statOf("id").maxLong === Some(1999L))
      assert(statOf("id").sumLong === Some((0L until 2000L).sum))
      assert(statOf("dict_s").minStr === Some("cat_0") && statOf("dict_s").maxStr === Some("cat_4"))
      assert(statOf("null_s").hasNull, "null column stat must record nulls")
      assert(!statOf("id").hasNull)
      assert(statOf("d").minDouble === Some(0.0) && statOf("d").maxDouble === Some(1999 * 0.25))

      // whole-column decode vs Spark's own reader, aligned by row order
      val sparkRows = spark.read.orc(path.replaceAll("/[^/]*$", ""))
        .orderBy("id").collect()
      val ourIds = OrcRead.readColumn(bytes, info, "id").map(_.get.asInstanceOf[Long])
      assert(ourIds === sparkRows.map(_.getLong(0)).toVector, "id column")
      df.schema.fields.zipWithIndex.foreach { case (fld, fi) =>
        val ours = OrcRead.readColumn(bytes, info, fld.name)
        assert(ours.size === 2000, s"${fld.name}: row count")
        sparkRows.zipWithIndex.foreach { case (row, ri) =>
          val theirs = if (row.isNullAt(fi)) None else Some(row.get(fi))
          val normalized = ours(ri).map {
            case l: Long if fld.dataType.typeName == "integer" => l.toInt
            case l: Long if fld.dataType.typeName == "byte" => l.toByte
            case v => v
          }
          assert(normalized === theirs, s"${fld.name} row $ri")
        }
      }
    }
  }

  test("multi-stripe files decode across stripe boundaries") {
    // small stripe size forces several stripes even at modest row counts
    val dir = Files.createTempDirectory("graft_orc_stripes").toString
    val df = (0 until 50000).map(i => (i.toLong, s"s${i % 9}", i * 0.5))
      .toDF("id", "s", "v").repartition(1).sortWithinPartitions("id")
    df.write.mode("overwrite")
      .option("compression", "zlib")
      .option("orc.stripe.size", (64 * 1024).toString)
      .orc(dir)
    val path = Files.list(Paths.get(dir)).iterator.asScala
      .map(_.toString).filter(_.endsWith(".orc")).toSeq.head
    val bytes = Files.readAllBytes(Paths.get(path))
    val info = OrcRead.read(bytes)
    assert(info.valid && info.numRows === 50000L)
    assert(info.stripes.size > 1, s"wanted multiple stripes, got ${info.stripes.size}")
    val ids = OrcRead.readColumn(bytes, info, "id").map(_.get.asInstanceOf[Long])
    assert(ids === (0L until 50000L).toVector)
    val vs = OrcRead.readColumn(bytes, info, "v").map(_.get.asInstanceOf[Double])
    assert(vs === (0 until 50000).map(_ * 0.5).toVector)
  }

  test("malformed inputs yield valid=false, never exceptions") {
    assert(!OrcRead.read(Array.emptyByteArray).valid)
    assert(!OrcRead.read(Array.fill[Byte](100)(0x41)).valid)
    assert(!OrcRead.read("ORC but not really".getBytes).valid)
    val real = {
      val path = writeOrc(Seq((1L, "a")).toDF("k", "s"), "zlib")
      Files.readAllBytes(Paths.get(path))
    }
    assert(OrcRead.read(real).valid)
    assert(!OrcRead.read(real.dropRight(1)).valid, "truncated tail")
    assert(!OrcRead.read(real.take(real.length / 2)).valid, "truncated half")
    val flipped = real.clone()
    flipped(flipped.length - 2) = (flipped(flipped.length - 2) ^ 0x7f).toByte
    assert(!OrcRead.read(flipped).valid, "corrupt postscript")
  }

  test("RLEv2 unit vectors: the public spec examples decode exactly") {
    // spec example: short repeat 10000 x5 → [0x0a, 0x27, 0x10]
    assert(OrcRead.decodeRleV2(Array(0x0a, 0x27, 0x10).map(_.toByte), 5, signed = false)
      .toSeq === Seq.fill(5)(10000L))
    // spec example: direct [23713, 43806, 57005, 48879] →
    // [0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef]
    assert(OrcRead.decodeRleV2(
      Array(0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef).map(_.toByte),
      4, signed = false).toSeq === Seq(23713L, 43806L, 57005L, 48879L))
    // spec example: delta 2,3,5,7,11,13,17,19,23,29 →
    // [0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]
    assert(OrcRead.decodeRleV2(
      Array(0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46).map(_.toByte),
      10, signed = false).toSeq === Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L))
    // spec example: patched base
    // [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]
    assert(OrcRead.decodeRleV2(
      Array(0x8e, 0x09, 0x2b, 0x21, 0x07, 0xd0, 0x1e, 0x00, 0x14, 0x70,
        0x28, 0x32, 0x3c, 0x46, 0x50, 0x5a, 0xfc, 0xe8).map(_.toByte),
      10, signed = false).toSeq ===
      Seq(2030L, 2000L, 2020L, 1000000L, 2040L, 2050L, 2060L, 2070L, 2080L, 2090L))
  }
}
