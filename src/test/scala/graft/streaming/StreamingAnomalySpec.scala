package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D16 — streaming per-key anomaly flagging: every verdict emitted
  * across micro-batches must equal the batch twin's prefix-window
  * formulation bit-for-bit (same exact integer moments, same double
  * expression chain), with O(1) state per key.
  */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String, Long, Double)]): String =
    rows.map { case (id, ts, u, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"view","value":$v}"""
    }.mkString("\n")

  // user 1: stable around 10.00 with one wild outlier after warm-up;
  // user 2: IDENTICAL values (variance 0) then any deviation at all
  private val drop1 = Seq(
    (1L, "2024-01-01 00:00:01", 1L, 10.00), (2L, "2024-01-01 00:00:02", 1L, 10.10),
    (3L, "2024-01-01 00:00:03", 1L, 9.90), (4L, "2024-01-01 00:00:04", 1L, 10.05),
    (5L, "2024-01-01 00:00:05", 1L, 9.95),
    (21L, "2024-01-01 00:00:01", 2L, 5.00), (22L, "2024-01-01 00:00:02", 2L, 5.00),
    (23L, "2024-01-01 00:00:03", 2L, 5.00), (24L, "2024-01-01 00:00:04", 2L, 5.00),
    (25L, "2024-01-01 00:00:05", 2L, 5.00))
  private val drop2 = Seq(
    (6L, "2024-01-01 00:00:06", 1L, 500.00), // the outlier
    (7L, "2024-01-01 00:00:07", 1L, 10.02),  // normal again (population shifted, still normal? judged vs history)
    (26L, "2024-01-01 00:00:06", 2L, 5.01))  // any deviation from variance-0 history

  test("streamed verdicts equal the batch prefix-window twin exactly") {
    val dir = Files.createTempDirectory("graft_anom").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = EventStreams.anomalies(src, k = 3, minN = 5)
      .writeStream.format("memory").queryName("anomaly_verdicts")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(drop1))
    q.processAllAvailable()
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(drop2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("anomaly_verdicts").as[EventStreams.AnomalyVerdict]
      .collect().map(v => (v.event_id, (v.user_id, v.n_before, v.cents, v.is_anomaly))).toMap

    // batch twin: exact integer prefix moments + the mirrored double chain
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val m = col("s_prev") / col("n_before")
    val batch = (drop1 ++ drop2).map { case (id, ts, u, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, v)
    }.toDF("event_id", "ts", "user_id", "value")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("n_before", count(lit(1)).over(w))
      .withColumn("s_prev", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("q_prev", coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .withColumn("is_anomaly", when(col("n_before") < 5, lit(false)).otherwise(
        (col("cents") - m) * (col("cents") - m) >
          lit(9L) * (col("q_prev") / col("n_before") - m * m)))
      .select("event_id", "user_id", "n_before", "cents", "is_anomaly")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, (r._2, r._3, r._4, r._5))).toMap

    assert(streamed == batch)
    // the semantics we expect from the data: warm-up never flags, the
    // outlier flags, the variance-0 key flags on ANY deviation
    assert(!streamed(5L)._4 && !streamed(25L)._4)
    assert(streamed(6L)._4, "3-sigma outlier must flag")
    assert(streamed(26L)._4, "deviation from a variance-0 history must flag")
    assert(!streamed(7L)._4, "normal value after the outlier stays unflagged")
  }
}
