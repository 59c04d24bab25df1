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
