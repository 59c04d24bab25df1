package graft.streaming

import graft.SparkSpec
import graft.functions.Stats
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D23 — streaming trend fit: live slope/intercept/r² must equal the
  * batch Stats.trendFit over the same events exactly (commutative
  * integer moments → identical double chain), across micro-batch
  * splits and regardless of arrival order.
  */
class StreamingTrendSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String, Long, Double)]): String =
    rows.map { case (id, ts, u, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"view","value":$v}"""
    }.mkString("\n")

  test("streamed fit equals the batch aggregate; arrival order is irrelevant") {
    val dir = Files.createTempDirectory("graft_trend").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = EventStreams.trend(src)
      .writeStream.format("memory").queryName("trend_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }

    // user 1: rising spend over days (delivered LATEST-FIRST to prove
    // order independence); user 2: constant x (same day) → null fit
    def at(day: Int, id: Long, u: Long, v: Double) =
      (id, f"2024-01-${day}%02d 12:00:00", u, v)
    val all = Seq(
      at(5, 5L, 1L, 30.00), at(4, 4L, 1L, 24.00), at(3, 3L, 1L, 27.00),
      at(2, 2L, 1L, 22.00), at(1, 1L, 1L, 20.00),
      at(2, 21L, 2L, 10.00), at(2, 22L, 2L, 14.00))
    drop("b1.jsonl", all.take(2))
    drop("b2.jsonl", all.drop(2))
    val streamed = spark.table("trend_updates").as[EventStreams.TrendUpdate]
      .collect().groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n) }
    q.stop()

    // batch twin: same x/y derivation through Stats.trendFit
    val batch = all.map { case (id, ts, u, v) =>
      val day = java.sql.Timestamp.valueOf(ts).toLocalDateTime.toLocalDate.toEpochDay -
        java.time.LocalDate.of(2024, 1, 1).toEpochDay
      (u, day, math.round(v * 100))
    }.toDF("u", "x", "y")
    val expected = Stats.trendFit(batch, "u", col("x"), col("y"))
      .select("g", "n", "slope", "intercept", "r2")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap

    for (u <- Seq(1L, 2L)) {
      val s = streamed(u); val e = expected(u)
      assert(s.n === e._2)
      assert(s.slope === e._3, s"user $u slope")
      assert(s.intercept === e._4, s"user $u intercept")
      assert(s.r2 === e._5, s"user $u r2")
    }
    assert(streamed(1L).slope.get > 0.0, "rising spend must fit a positive slope")
    assert(streamed(2L).slope.isEmpty, "zero x-variance yields a null fit")
  }
}
