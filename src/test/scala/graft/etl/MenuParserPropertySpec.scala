package graft.etl

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based robustness (raw ScalaCheck generators, fixed seeds —
  * the scalatest/scalacheck bridge artifact isn't on the offline
  * classpath): parser/validator must never throw and must keep their
  * invariants on arbitrary garbage — a 100 TB corpus WILL contain
  * every malformed line imaginable.
  */
class MenuParserPropertySpec extends SparkSpec {
  import spark.implicits._

  private val menuish: Gen[String] = for {
    name <- Gen.alphaStr
    cents <- Gen.chooseNum(-100000L, 200000000L)
    junk <- Gen.oneOf("", "....", "$", "Half:", "[Vegan]", "(Hot)", " ", "¥¥¥", "  ", "\t", "£")
    pick <- Gen.chooseNum(0, 4)
  } yield {
    val p = s"${cents / 100}.${math.abs(cents % 100)}"
    pick match {
      case 0 => s"$name .... $$$p $junk"
      case 1 => s"$junk$name$junk"
      case 2 => s"$name Half: $$$p Full: $junk"
      case 3 => s"$name .... Small: $$$p Medium: $$$p Large: $$$p"
      case _ => junk
    }
  }

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).toSeq)

  test("parser + validator never throw and keep invariants on garbage lines") {
    val lines = samples(menuish, 300)
    val df = lines.zipWithIndex
      .map { case (l, i) => (i.toLong % 7, i.toLong, l) }
      .toDF("doc_id", "line_no", "line")
    val out = MenuValidator.validate(MenuParser.parse(df)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (r.getAs[Boolean]("is_valid")) {
        val name = r.getAs[String]("item_name")
        assert(name != null && name.length >= 2 && !name.contains("  "))
        val prices = MenuValidator.PriceCols.map(c => Option(r.getAs[java.lang.Double](c)))
        assert(prices.exists(_.isDefined))
        prices.flatten.foreach(p => assert(p >= 0 && p <= 100000))
      } else {
        assert(r.getAs[String]("reject_reason") != null)
      }
    }
  }

  test("normalizer is idempotent on printable garbage") {
    import org.apache.spark.sql.functions.col
    val texts = samples(Gen.listOfN(40, Gen.asciiPrintableChar).map(_.mkString), 100)
    val df = texts.toDF("t")
    val twice = df.select(
      TextNormalizer.normalize(col("t")).as("n1"))
      .select(col("n1"), TextNormalizer.normalize(col("n1")).as("n2"))
    twice.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent for ${r.getString(0)}")
    }
  }
}
