package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files

class CompactedSinkSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  test("small target yields multiple files; large target compacts to one") {
    val docs = Tables.documents(spark, sf())
    val base = Files.createTempDirectory("graft_sink").toString

    val nSmall = CompactedSink.writeParquet(docs, s"$base/small", targetBytes = 2 << 10)
    assert(nSmall > 1, s"expected multiple partitions for a 2KB target, got $nSmall")
    assert(parquetFiles(s"$base/small") == nSmall)

    val nBig = CompactedSink.writeParquet(docs, s"$base/big", targetBytes = 10L << 30)
    assert(nBig == 1)
    assert(parquetFiles(s"$base/big") == 1)
  }

  test("planned partition count scales inversely with target size") {
    val docs = Tables.documents(spark, sf())
    val at2k = CompactedSink.plannedPartitions(docs, targetBytes = 2 << 10)
    val at1m = CompactedSink.plannedPartitions(docs, targetBytes = 1 << 20)
    assert(at2k > at1m)
  }

  test("heavy_hitters is reachable from pure SQL via the extensions registry") {
    graft.plans.GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("hh_in")
    val out = spark.sql("SELECT heavy_hitters(t, 4) AS hh FROM hh_in")
      .selectExpr("hh[0].item AS top").as[String].head()
    assert(out == "a")
  }
}
