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

  test("scalar py_title and the sketch aggregates work from SQL") {
    GraftExtensions.registerAll(spark)
    (0 until 100).map(i => s"tok${i % 25}").toDF("tok").createOrReplaceTempView("toks")
    val r = spark.sql(
      """SELECT py_title('ǆenan one') AS t,
        |       hll_distinct(tok, 12) AS hll,
        |       cms_estimates(tok, array('tok0', 'absent'), 4, 1024) AS cms,
        |       cms_table(tok, 4, 64) AS tbl
        |FROM toks""".stripMargin).head()
    assert(r.getAs[String]("t") == "ǅenan One") // one-to-many titlecase mapping
    assert(math.abs(r.getAs[Long]("hll") - 25L) <= 3L) // linear counting, register collisions allowed
    val cms = r.getStruct(r.fieldIndex("cms"))
    assert(cms.getAs[Long]("n") == 100L)
    assert(cms.getSeq[Long](cms.fieldIndex("ests")).head == 4L)
    val tbl = r.getStruct(r.fieldIndex("tbl"))
    assert(tbl.getAs[Long]("n") == 100L)
    assert(tbl.getSeq[Long](tbl.fieldIndex("table")).sum == 400L) // 100 rows x 4 depth
  }
}
