package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the behaviors of the reference's normalize_extracted_text
  * (restaurant_etl/utils/clean_text.py).
  */
class TextNormalizerSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextNormalizer.normalize(col("t"))).as[String].head()

  test("page markers removed") {
    assert(norm("--- Page 1 ---\nhello world\n--- Page 2 ---\nmore text")
      == "hello world\nmore text")
  }

  test("short and punctuation-only lines dropped") {
    assert(norm("ok line\nx\n!!!\n__\nanother line") == "ok line\nanother line")
  }

  test("dot runs collapse to a space") {
    assert(norm("Samosa....price follows") == "Samosa price follows")
  }

  test("multi-space and blank-line collapse + trim") {
    assert(norm("  a   b  \n\n\n\nc  d ") == "a b\nc d")
  }

  test("empty input") {
    assert(norm("") == "")
  }

  test("chunks: exact boundaries and short text") {
    val chunks = Seq("abcdefghij").toDF("t")
      .select(TextNormalizer.chunks(col("t"), 4)).as[Seq[String]].head()
    assert(chunks == Seq("abcd", "efgh", "ij"))
    val one = Seq("ab").toDF("t")
      .select(TextNormalizer.chunks(col("t"), 4)).as[Seq[String]].head()
    assert(one == Seq("ab"))
  }
}
