package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2 D1-D3): windowed agg with
  * watermark, gap sessionization via flatMapGroupsWithState, and
  * streaming dedup — driven through MemoryStream micro-batches.
  */
class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("D1: tumbling window counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.hourlyTypeCounts(df)
      .writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try {
      mem.addData((1L, ts(5), "click", 1.0), (2L, ts(10), "click", 2.0), (3L, ts(20), "error", 3.0))
      q.processAllAvailable()
      val byType = spark.table("win_counts").select("event_type", "n").as[(String, Long)].collect().toMap
      assert(byType("click") == 2L && byType("error") == 1L)
    } finally q.stop()
  }

  test("D2: gap sessionization closes a session after inactivity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 7: events at 10:00 and 10:05 (one session), then 10:40 (new session
      // → emits the first one on arrival)
      mem.addData(
        EventStreams.Event(1L, ts(0), 7L, "click", 1.0),
        EventStreams.Event(2L, ts(5), 7L, "click", 2.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(3L, ts(40), 7L, "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("sessions").as[EventStreams.Session].collect()
      assert(out.length == 1)
      assert(out.head.n_events == 2L && out.head.total_value == 3.0)
      assert(out.head.session_start == ts(0) && out.head.session_end == ts(5))
    } finally q.stop()
  }

  test("D3: dropDuplicatesWithinWatermark removes replayed event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupedEvents(df)
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "a"), (3L, ts(4), "c")) // replay of id 1
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
