package graft.streaming

import graft.SparkSpec
import graft.functions.HyperLogLog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D17 — streaming HLL distinct counts: after any sequence of
  * micro-batches the per-key state must be register-identical to a
  * batch sketch of the union, so the streamed estimate equals the
  * batch aggregate's exactly; replayed values never move it.
  */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(String, String)]): String =
    rows.map { case (k, v) => s"""{"key":"$k","value":"$v"}""" }.mkString("\n")

  test("streamed estimates equal the batch hll aggregate bit-for-bit") {
    val dir = Files.createTempDirectory("graft_hllstream").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("key STRING, value STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[StreamingDistinct.KeyedValue]
    val q = StreamingDistinct.distinctCounts(src, p = 12)
      .writeStream.format("memory").queryName("hll_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    val drop1 = (0 until 400).map(i => ("en", s"tok${i % 150}")) ++
      (0 until 50).map(i => ("de", s"wort$i"))
    val drop2 = (0 until 400).map(i => ("en", s"tok${100 + i % 200}")) ++ // overlaps 100-149
      Seq(("de", "wort0"), ("de", "wort1")) // pure replays — must not move the estimate
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(drop1))
    q.processAllAvailable()
    val afterB1 = spark.table("hll_updates").as[StreamingDistinct.DistinctUpdate]
      .collect().map(u => u.key -> u).toMap
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(drop2))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("hll_updates").as[StreamingDistinct.DistinctUpdate].collect()
    val last = updates.groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.n_events) }

    // batch twin over the union of both drops
    HyperLogLog.register(spark)
    val batch = (drop1 ++ drop2).toDF("key", "value")
      .groupBy("key").agg(HyperLogLog.hllDistinct(col("value"), 12).as("est"))
      .as[(String, Long)].collect().toMap
    assert(last("en").estimate == batch("en"))
    assert(last("de").estimate == batch("de"))
    // replays in drop 2 left the de estimate where batch 1 put it
    assert(last("de").estimate == afterB1("de").estimate)
    assert(last("en").n_events == 800L && last("de").n_events == 52L)
  }
}
