package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Funnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** D11 — streaming funnel: per-user live funnel depth must equal the
  * batch Funnel.depth fold over the same events, including when
  * arrival order INVERTS event-time order across micro-batches.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def jsonl(rows: Seq[(Long, String, Long, String)]): String =
    rows.map { case (id, ts, u, t) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"$t","value":1.0}"""
    }.mkString("\n")

  test("out-of-order arrival across micro-batches converges to the batch fold") {
    val dir = Files.createTempDirectory("graft_funnel").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))

    // drop 1 arrives FIRST but holds the event-time LATEST step
    // (purchase) plus noise; drop 2 delivers the earlier view+click.
    // A naive arrival-order automaton would end at stage 0/1; the
    // event-time fold must end converted (stage 3).
    val drop1 = Seq(
      (1L, "2024-01-01T00:00:30.000", 1L, "purchase"),
      (2L, "2024-01-01T00:00:05.000", 1L, "error"),
      (3L, "2024-01-01T00:00:01.000", 2L, "click")) // user 2: click only
    val drop2 = Seq(
      (4L, "2024-01-01T00:00:10.000", 1L, "view"),
      (5L, "2024-01-01T00:00:20.000", 1L, "click"),
      (6L, "2024-01-01T00:00:02.000", 2L, "signup"))

    // ONE continuous query (memory sink cannot recover a checkpoint),
    // drained after each drop — state carries across micro-batches
    // inside the running query
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = EventStreams.funnelDepth(src, Steps)
      .writeStream.format("memory").queryName("funnel_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def latest(): Map[Long, EventStreams.FunnelUpdate] =
      spark.table("funnel_updates").as[EventStreams.FunnelUpdate]
        .collect().groupBy(_.user_id)
        // update mode appends one row per (user, micro-batch); the one
        // with the most step events is the latest state
        .map { case (u, rows) => u -> rows.maxBy(_.n_step_events) }

    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(drop1))
    q.processAllAvailable()
    val after1 = latest()
    assert(after1(1L).funnel_stage === 0L, "purchase before any view must not advance")

    Files.writeString(java.nio.file.Paths.get(dir, "in", "b2.jsonl"), jsonl(drop2))
    q.processAllAvailable()
    val after2 = latest()
    q.stop()

    // batch twin over ALL events
    val all = (drop1 ++ drop2).map { case (id, ts, u, t) =>
      (u, micros(Timestamp.valueOf(ts.replace('T', ' '))), id, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val batch = Funnel.depth(all, "user_id", "ts_us", "event_id", "event_type", Steps)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(after2(1L).funnel_stage === batch(1L).getAs[Long]("funnel_stage"))
    assert(after2(1L).funnel_stage === 3L && after2(1L).converted,
      "late-arriving earlier steps must unlock the full funnel")
    assert(after2(2L).funnel_stage === batch(2L).getAs[Long]("funnel_stage"))
    assert(after2(2L).funnel_stage === 0L, "click+signup with no view stays at 0")
  }

  test("lateness pruning keeps state flat; a late event inside L still re-folds") {
    val dir = Files.createTempDirectory("graft_funnel_prune").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = EventStreams.funnelDepth(src, Steps, lateness = Some("1 hour"))
      .writeStream.format("memory").queryName("funnel_pruned")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }
    def latest(): Map[Long, EventStreams.FunnelUpdate] =
      spark.table("funnel_pruned").as[EventStreams.FunnelUpdate]
        .collect().groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_.n_step_events) }

    // day 1: user 1 reaches stage 2; user 2 views on day 2 morning
    drop("b1.jsonl", Seq(
      (1L, "2024-01-01T10:00:00.000", 1L, "view"),
      (2L, "2024-01-01T10:10:00.000", 1L, "click"),
      (3L, "2024-01-02T10:00:00.000", 2L, "view")))
    // advance the watermark past day 1 (max event time 13:00 − 1 h)
    drop("b2.jsonl", Seq((4L, "2024-01-02T13:00:00.000", 1L, "purchase")))
    val after2 = latest()
    assert(after2(1L).funnel_stage === 3L && after2(1L).converted)
    // next batch's frontier is 12:00 day 2: user 1's day-1 events and
    // user 2's 10:00 view finalize into the O(steps) base anchors
    drop("b3.jsonl", Seq(
      (5L, "2024-01-02T13:05:00.000", 2L, "purchase"),
      (6L, "2024-01-02T13:06:00.000", 1L, "signup")))
    val after3 = latest()
    assert(after3(1L).n_buffered === 1L,
      s"day-1 events must prune once the frontier passes them (got ${after3(1L).n_buffered})")
    assert(after3(1L).funnel_stage === 3L, "pruning must not lose the converted stage")
    assert(after3(2L).funnel_stage === 1L, "view then purchase without click stays at 1")
    assert(after3(2L).n_buffered === 1L, "user 2's pruned view lives in base anchors")

    // late click INSIDE the lateness window (frontier 12:06), arriving
    // after the purchase AND after its preceding view was finalized:
    // the re-fold over (finalized base + buffered purchase) must
    // still unlock stage 3
    drop("b4.jsonl", Seq((7L, "2024-01-02T12:40:00.000", 2L, "click")))
    val after4 = latest()
    q.stop()
    assert(after4(2L).funnel_stage === 3L,
      "a late click within lateness must chain a finalized view to a buffered purchase")
    assert(after4(2L).n_step_events === 3L)
    assert(after4.values.forall(_.n_buffered <= 2L),
      "state must stay bounded by the lateness window, not total history")

    // batch twin agrees on the final stages
    val all = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"), (2L, "2024-01-01 10:10:00", 1L, "click"),
      (4L, "2024-01-02 13:00:00", 1L, "purchase"), (6L, "2024-01-02 13:06:00", 1L, "signup"),
      (3L, "2024-01-02 10:00:00", 2L, "view"), (7L, "2024-01-02 12:40:00", 2L, "click"),
      (5L, "2024-01-02 13:05:00", 2L, "purchase"))
      .map { case (id, ts, u, t) => (u, micros(Timestamp.valueOf(ts)), id, t) }
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val batch = Funnel.depth(all, "user_id", "ts_us", "event_id", "event_type", Steps)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_stage")).toMap
    assert(after4(1L).funnel_stage === batch(1L))
    assert(after4(2L).funnel_stage === batch(2L))
  }

  test("maxSpan mirrors the batch windowed fold over streamed events") {
    val dir = Files.createTempDirectory("graft_funnel_span").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    // 10-minute span: user 1's chain completes inside it, user 2's
    // purchase lands 11 minutes after its view
    val spanUs = 10L * 60 * 1000000
    val rows = Seq(
      (1L, "2024-01-01T10:00:00.000", 1L, "view"), (2L, "2024-01-01T10:04:00.000", 1L, "click"),
      (3L, "2024-01-01T10:09:00.000", 1L, "purchase"),
      (4L, "2024-01-01T10:00:00.000", 2L, "view"), (5L, "2024-01-01T10:04:00.000", 2L, "click"),
      (6L, "2024-01-01T10:11:00.000", 2L, "purchase"))
    val q = EventStreams.funnelDepth(src, Steps, maxSpanUs = spanUs)
      .writeStream.format("memory").queryName("funnel_span")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    Files.writeString(java.nio.file.Paths.get(dir, "in", "b1.jsonl"), jsonl(rows))
    q.processAllAvailable()
    val streamed = spark.table("funnel_span").as[EventStreams.FunnelUpdate]
      .collect().map(u => u.user_id -> u.funnel_stage).toMap
    q.stop()
    val batch = Funnel.windowedDepth(
      rows.map { case (id, ts, u, t) =>
        (u, micros(Timestamp.valueOf(ts.replace('T', ' '))), id, t) }
        .toDF("user_id", "ts_us", "event_id", "event_type"),
      "user_id", "ts_us", "event_id", "event_type", Steps, spanUs)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_stage")).toMap
    assert(streamed(1L) === 3L && batch(1L) === 3L)
    assert(streamed(2L) === 2L && batch(2L) === 2L,
      "purchase past maxSpan must not convert in either engine")
  }

  test("streamed corpus events converge to the oracle-checked q73 result") {
    val dir = Files.createTempDirectory("graft_funnel_c").toString
    val ev = Tables.events(spark, sf())
    ev.write.mode("overwrite").parquet(s"$dir/in_parquet")
    val src = spark.readStream.schema(ev.schema).parquet(s"$dir/in_parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.funnelDepth(src, Steps)
      .writeStream.format("memory").queryName("funnel_corpus")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("funnel_corpus").as[EventStreams.FunnelUpdate]
      .collect().map(u => u.user_id -> u.funnel_stage).toMap
    val batch = graft.SparkEntry.queries("q73_funnel")(spark, sf())
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_stage")).toMap
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (u, st) =>
      assert(streamed(u) === st, s"user $u: streaming ${streamed(u)} vs batch $st")
    }
  }

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}
