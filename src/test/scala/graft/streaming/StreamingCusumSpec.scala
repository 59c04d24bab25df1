package graft.streaming

import graft.SparkSpec
import graft.functions.Stats
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D21 — streaming CUSUM: per-event statistics emitted across
  * micro-batches must equal the batch window closed form (q128's
  * Stats.cusum) exactly on event-time-ordered arrival, with five
  * longs of state per key and the first-alarm id latched forever.
  */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String, Long, Double)]): String =
    rows.map { case (id, ts, u, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"view","value":$v}"""
    }.mkString("\n")

  // user 1: baseline ~25.00, then a persistent +15.00 level shift —
  // each post-shift value is unremarkable alone, the drift accumulates;
  // user 2: stays at baseline throughout (statistic pinned at 0)
  private val drop1 = Seq(
    (1L, "2024-01-01 00:00:01", 1L, 25.00), (2L, "2024-01-01 00:00:02", 1L, 26.00),
    (3L, "2024-01-01 00:00:03", 1L, 24.00),
    (21L, "2024-01-01 00:00:01", 2L, 25.00), (22L, "2024-01-01 00:00:02", 2L, 25.00))
  private val drop2 = Seq(
    (4L, "2024-01-01 00:00:04", 1L, 40.00), (5L, "2024-01-01 00:00:05", 1L, 40.00),
    (6L, "2024-01-01 00:00:06", 1L, 41.00), (7L, "2024-01-01 00:00:07", 1L, 39.00),
    (8L, "2024-01-01 00:00:08", 1L, 40.00),
    (23L, "2024-01-01 00:00:03", 2L, 25.00), (24L, "2024-01-01 00:00:04", 2L, 24.50))

  test("streamed statistics equal the batch window closed form; first alarm latches") {
    val dir = Files.createTempDirectory("graft_cusum").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    // target 25.00, slack 2.00, threshold 30.00 (3000 cents): the
    // +15 shift adds 1300 cents of drift per event → alarm on the
    // third post-shift event
    val q = EventStreams.cusum(src, targetCents = 2500L, slackCents = 200L, h = 3000L)
      .writeStream.format("memory").queryName("cusum_verdicts")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(drop1))
    q.processAllAvailable()
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(drop2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cusum_verdicts").as[EventStreams.CusumVerdict]
      .collect().map(v => v.event_id -> v).toMap

    // batch twin: the window closed form over the same events
    val batch = (drop1 ++ drop2).map { case (id, ts, u, v) =>
      (u, id, java.sql.Timestamp.valueOf(ts).getTime * 1000L, math.round(v * 100))
    }.toDF("user_id", "event_id", "ts_us", "cents")
    val scored = Stats.cusum(batch, "user_id", Seq(col("ts_us"), col("event_id")),
      col("cents"), targetCents = 2500L, slackCents = 200L)
      .select("event_id", "s_pos", "s_neg").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(streamed.keySet === scored.keySet)
    for ((id, (sp, sn)) <- scored) {
      assert(streamed(id).s_pos === sp, s"event $id s_pos: stream vs batch")
      assert(streamed(id).s_neg === sn, s"event $id s_neg: stream vs batch")
    }
    // drift math: post-shift events add 4000−2500−200 = 1300 each →
    // alarm (s_pos > 3000) first fires on event 6 (3900 after #5? —
    // check: e4 → 1300, e5 → 2600, e6 → 2600+1400=4000 > 3000)
    assert(!streamed(4L).alarm && !streamed(5L).alarm)
    assert(streamed(6L).alarm, "third post-shift event crosses h")
    assert(streamed.values.filter(_.user_id == 2L).forall(v => !v.alarm && v.s_pos === 0L || v.s_pos <= 50L),
      "baseline user never alarms")
    // n_alarms carried in state is monotone and counts alarm rows
    val u1 = streamed.values.filter(_.user_id == 1L).toSeq.sortBy(_.event_id)
    assert(u1.last.n_alarms === u1.count(_.alarm).toLong)
  }
}
