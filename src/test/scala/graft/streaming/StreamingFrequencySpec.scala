package graft.streaming

import graft.SparkSpec
import graft.functions.CountMin
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D18 — streaming Count-Min frequencies: after any micro-batch
  * sequence the per-key estimates must equal the batch cms_estimates
  * aggregate exactly (counter addition is commutative), and the CMS
  * never-undercount guarantee must hold live at every update.
  */
class StreamingFrequencySpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(String, String)]): String =
    rows.map { case (k, t) => s"""{"key":"$k","token":"$t"}""" }.mkString("\n")

  test("streamed estimates equal the batch sketch; never undercount live") {
    val dir = Files.createTempDirectory("graft_cmsstream").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val probes = Seq("alpha", "beta", "missing")
    val src = spark.readStream
      .schema("key STRING, token STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[StreamingFrequency.KeyedToken]
    val q = StreamingFrequency.frequencies(src, probes, depth = 4, width = 256)
      .writeStream.format("memory").queryName("cms_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    val drop1 = (0 until 30).map(i => ("en", if (i % 3 == 0) "alpha" else s"w$i")) ++
      (0 until 10).map(_ => ("de", "beta"))
    val drop2 = (0 until 40).map(i => ("en", if (i % 2 == 0) "alpha" else "beta"))
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(drop1))
    q.processAllAvailable()
    val afterB1 = spark.table("cms_updates").as[StreamingFrequency.FrequencyUpdate]
      .collect().map(u => u.key -> u).toMap
    // live never-undercount after batch 1
    assert(afterB1("en").estimates.head >= 10L) // alpha appeared 10x
    assert(afterB1("de").estimates(1) >= 10L)   // beta appeared 10x
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(drop2))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("cms_updates").as[StreamingFrequency.FrequencyUpdate]
      .collect().groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.n_tokens) }

    // batch twin over the union of both drops
    CountMin.register(spark)
    val batch = (drop1 ++ drop2).toDF("key", "token")
      .groupBy("key")
      .agg(CountMin.cmsEstimates(col("token"), probes, 4, 256).as("c"))
      .select(col("key"), col("c.n"), col("c.ests"))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(last("en").n_tokens == batch("en")._1)
    assert(last("en").estimates == batch("en")._2)
    assert(last("de").estimates == batch("de")._2)
    // exact values at generous width on this tiny vocabulary
    assert(last("en").estimates.head == 30L) // alpha: 10 + 20
    assert(last("de").estimates == Seq(0L, 10L, 0L))
  }
}
