package graft.plans

import graft.SparkSpec

/** The pure-SQL surface of the native expressions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered functions are callable from SQL") {
    GraftExtensions.registerAll(spark)
    Seq(("hello world hello", 1L)).toDF("text", "id").createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT simhash64(text) AS sh,
        |       size(hashed_shingles(text, 3)) AS nsh,
        |       size(minhash_sig(text, 3, 32, 42)) AS k,
        |       sorted_jaccard(hashed_shingles(text, 3), hashed_shingles(text, 3)) AS j,
        |       float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |FROM t""".stripMargin).head()
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Int]("nsh") > 0)
    assert(r.getAs[Int]("k") == 32)
    assert(r.getAs[Double]("j") == 1.0)
    assert(r.getAs[Double]("d") == 11.0)
  }

}
