package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "durian durian durian")
  ).toDF("doc_id", "text")

  test("tf, df and the ln-weighted score behave as defined") {
    val out = TfIdf.compute(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) -> r).toMap
    val apple = out((1L, "apple"))
    assert(apple.getAs[Long]("n_term") == 2L)
    assert(apple.getAs[Long]("df") == 1L)
    assert(apple.getAs[Double]("tf") == 2.0 / 3.0)
    assert(apple.getAs[Double]("tfidf") == (2.0 / 3.0) * math.log(4.0 / 2.0))
    // a corpus-wide token gets lower idf than a rare one
    val banana1 = out((1L, "banana"))
    assert(banana1.getAs[Double]("tfidf") < apple.getAs[Double]("tfidf"))
    // rare heavy token dominates its doc
    val durian = out((3L, "durian"))
    assert(durian.getAs[Double]("tf") == 1.0)
  }
}
