package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.GapFill
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D12 — streaming LOCF frontier: after draining all events, each
  * key's live frontier must equal the LAST filled value of the batch
  * gap-fill over the same events, including under inverted arrival
  * order.
  */
class StreamingLocfSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String, Long, Double)]): String =
    rows.map { case (id, ts, u, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"view","value":$v}"""
    }.mkString("\n")

  test("late-arriving older events never overwrite the frontier; matches batch LOCF") {
    val dir = Files.createTempDirectory("graft_locf").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = EventStreams.locfFrontier(src)
      .writeStream.format("memory").queryName("locf_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def latest(): Map[Long, EventStreams.LocfUpdate] =
      spark.table("locf_updates").as[EventStreams.LocfUpdate]
        .collect().groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_.n_events) }

    // drop 1: the event-time NEWEST value arrives first
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(Seq(
      (10L, "2024-01-05 00:00:00", 1L, 7.25),
      (11L, "2024-01-01 00:00:00", 2L, 1.0))))
    q.processAllAvailable()
    assert(latest()(1L).filled_cents === 725L)

    // drop 2: an event-time OLDER value for user 1 — must NOT win;
    // a same-ts higher-eid event for user 2 — must win (tie order)
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(Seq(
      (12L, "2024-01-02 00:00:00", 1L, 99.0),
      (13L, "2024-01-01 00:00:00", 2L, 3.5))))
    q.processAllAvailable()
    val m = latest()
    q.stop()
    assert(m(1L).filled_cents === 725L, "older event must not overwrite the frontier")
    assert(m(1L).n_events === 2L)
    assert(m(2L).filled_cents === 350L, "same-ts tie breaks by event_id, like batch")

    // batch twin: frontier == the last day's filled value per key
    val batchIn = Seq(
      (1L, java.sql.Date.valueOf("2024-01-05"), 500L, 10L, 725L),
      (1L, java.sql.Date.valueOf("2024-01-02"), 200L, 12L, 9900L),
      (2L, java.sql.Date.valueOf("2024-01-01"), 100L, 11L, 100L),
      (2L, java.sql.Date.valueOf("2024-01-01"), 100L, 13L, 350L))
      .toDF("k", "d", "ts", "eid", "v")
    val lastFilled = GapFill.dailyLocf(batchIn, "k", "d", Seq("ts", "eid"), "v")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(col("d").desc)))
      .filter(col("_rn") === 1)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("filled_value")).toMap
    assert(lastFilled(1L) === m(1L).filled_cents)
    assert(lastFilled(2L) === m(2L).filled_cents)
  }

  test("cent encoding matches Spark round(v*100) for signed half-cent values") {
    // the frontier's cents must equal the batch path's HALF_UP
    // round(value*100) for ALL signs — math.round (half toward
    // positive infinity) disagrees on negative half-cents
    val tricky = Seq(-0.005, -1.125, -0.015, 2.675, 0.005, -99.995)
    val dir = Files.createTempDirectory("graft_locf_neg").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val rows = tricky.zipWithIndex.map { case (v, i) =>
      (100L + i, "2024-01-01 00:00:00", 10L + i, v)
    }
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b.jsonl"), jsonl(rows))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(s"$dir/in").as[EventStreams.Event]
    val q = EventStreams.locfFrontier(src)
      .writeStream.format("memory").queryName("locf_neg")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("locf_neg").as[EventStreams.LocfUpdate]
      .collect().map(u => u.user_id -> u.filled_cents).toMap
    val batch = tricky.zipWithIndex
      .map { case (v, i) => (10L + i, v) }.toDF("user_id", "value")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("vc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    batch.foreach { case (u, vc) =>
      assert(streamed(u) === vc, s"user $u: streaming ${streamed(u)} vs Spark round $vc")
    }
  }

  test("corpus frontier equals the last spine row of batch gap-fill per user") {
    val dir = Files.createTempDirectory("graft_locf_c").toString
    val ev = Tables.events(spark, sf())
    ev.write.mode("overwrite").parquet(s"$dir/in_parquet")
    val src = spark.readStream.schema(ev.schema).parquet(s"$dir/in_parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.locfFrontier(src)
      .writeStream.format("memory").queryName("locf_corpus")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("locf_corpus").as[EventStreams.LocfUpdate]
      .collect().groupBy(_.user_id)
      .map { case (u, rows) => u -> rows.maxBy(_.n_events).filled_cents }

    val e = ev.select(col("user_id"), to_date(col("ts")).as("d"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      round(col("value") * 100).cast("long").as("vc"))
    val batch = GapFill.dailyLocf(e, "user_id", "d", Seq("ts_us", "event_id"), "vc")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("d").desc)))
      .filter(col("_rn") === 1)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("filled_value")).toMap

    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (u, v) =>
      assert(streamed(u) === v, s"user $u: streaming ${streamed(u)} vs batch $v")
    }
  }
}
