package graft.streaming

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming ↔ batch equivalence: the streaming operators must
  * produce EXACTLY the sessions/windows of their oracle-checked batch
  * twins (q17_time_window / q35_sessionize — both hash-verified
  * against DuckDB by the driver) when run over the same events.
  * This is the Structured Streaming promise — one declarative
  * semantics, two execution modes — asserted rather than assumed.
  *
  * total_value is compared with a 1e-6 tolerance: the batch twins sum
  * in exact cents space while the streaming operators sum raw doubles
  * in arrival order, so the boundary/count equality is exact and only
  * the float accumulation differs in the last ulps.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("hourlyTypeCounts via Trigger.AvailableNow == oracle-checked q17 batch twin") {
    val ev = Tables.events(spark, sf())
    val dir = Files.createTempDirectory("graft_stream_eq").toString
    ev.write.mode("overwrite").parquet(s"$dir/in")

    val src = spark.readStream.schema(ev.schema).parquet(s"$dir/in")
    val q = EventStreams.hourlyTypeCounts(src)
      .writeStream.format("memory").queryName("eq_win")
      .outputMode("complete") // all windows, including the unfinalized last one
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()

    val streamed = spark.table("eq_win")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect()
      .map { case (w, t, n, v) => (w, t) -> ((n, v)) }.toMap

    val batch = SparkEntry.queries("q17_time_window")(spark, sf())
      .as[(String, String, Long, Double)].collect()

    assert(batch.nonEmpty && streamed.size == batch.length)
    batch.foreach { case (w, t, n, v) =>
      val (sn, sv) = streamed((w, t))
      assert(sn == n, s"count mismatch in window ($w, $t): streaming $sn vs batch $n")
      assert(math.abs(sv - v) < 1e-6, s"value mismatch in window ($w, $t): $sv vs $v")
    }
  }

  test("stream-stream interval join (AvailableNow) == batch inequality join") {
    val ev = Tables.events(spark, sf())
    val dir = Files.createTempDirectory("graft_ssj").toString
    ev.filter(col("event_type") === "click").write.parquet(s"$dir/clicks")
    ev.filter(col("event_type") === "purchase").write.parquet(s"$dir/purchases")

    // non-default maxDelay on BOTH sides: the knob must be real (the
    // round-4 verdict found the doc'd parameter was a hardcoded hour)
    val clickSchema = spark.read.parquet(s"$dir/clicks").schema
    val q = EventStreams.clickPurchaseJoin(
      spark.readStream.schema(clickSchema).parquet(s"$dir/clicks"),
      spark.readStream.schema(clickSchema).parquet(s"$dir/purchases"),
      maxDelay = "30 minutes")
      .writeStream.format("memory").queryName("eq_ssj").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
    val streamed = spark.table("eq_ssj")
      .select($"click_id", $"user_id", col("purchase_ts"))
      .as[(Long, Long, Timestamp)].collect().toSet

    // batch twin: same join, no watermarks, plain inequality condition
    val batch = EventStreams.clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      maxDelay = "30 minutes")
      .select($"click_id", $"user_id", col("purchase_ts"))
      .as[(Long, Long, Timestamp)].collect().toSet

    // an inner stream-stream join emits matches as both sides arrive;
    // AvailableNow drains everything, so the sets must be identical
    assert(batch.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} vs batch ${batch.size} matches")

    // the knob must actually bound the interval: widening it re-admits
    // purchases between 30 and 60 minutes after the click
    val wider = EventStreams.clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      maxDelay = "1 hour")
      .select($"click_id", $"user_id", col("purchase_ts"))
      .as[(Long, Long, Timestamp)].collect().toSet
    assert(batch.subsetOf(wider) && batch.size < wider.size,
      s"maxDelay=30m (${batch.size}) should be a strict subset of 1h (${wider.size})")
  }

  test("text annotation stage (quality/langid/tokens) runs unchanged on a stream") {
    import graft.functions.{LangId, TextFunctions}
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val dir = Files.createTempDirectory("graft_annot").toString
    docs.write.parquet(s"$dir/in")

    def annotate(df: org.apache.spark.sql.DataFrame) =
      LangId.detected(df, "text")
        .select(col("doc_id"), col("lang_detect.lang").as("lang"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))

    val q = annotate(spark.readStream.schema(docs.schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("eq_annot").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()

    val streamed = spark.table("eq_annot")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    val batch = annotate(docs)
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    assert(batch.nonEmpty && streamed == batch) // map-only ⇒ bit-identical
  }

  test("Gopher quality gate runs unchanged on a stream (map-only, bit-identical)") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val dir = Files.createTempDirectory("graft_gopher").toString
    docs.write.parquet(s"$dir/in")

    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.functions.GopherRules.signals(df)
        .select(col("doc_id"), col("n_words"), col("n_symbols"), col("n_stop"), col("keep"))

    val q = gate(spark.readStream.schema(docs.schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("eq_gopher").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()

    val streamed = spark.table("eq_gopher")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val batch = gate(docs)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer == oracle-checked q35 batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf())
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event].collect()
    val maxTs = events.map(_.ts.getTime).max

    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(mem.toDS()) // 30 min gap, 1 h watermark
      .writeStream.format("memory").queryName("eq_sessions")
      .outputMode("append").start()
    try {
      mem.addData(events.toIndexedSeq: _*)
      q.processAllAvailable()
      // Event-time timeouts fire in a batch AFTER the watermark passes
      // lastSeen+gap: sentinel batch 1 advances the watermark, sentinel
      // batch 2 executes with it — flushing every real user's open
      // session. (This is why the sessionizer leg drives explicit
      // micro-batches instead of one AvailableNow pass: an append-mode
      // stateful operator emits nothing for state the watermark never
      // overtakes.)
      mem.addData(EventStreams.Event(-1L, new Timestamp(maxTs + 3L * 3600 * 1000), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(-2L, new Timestamp(maxTs + 6L * 3600 * 1000), -1L, "sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("eq_sessions").as[EventStreams.Session].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, micros(s.session_start), micros(s.session_end)) ->
          ((s.n_events, s.total_value))).toMap

      val batch = SparkEntry.queries("q35_sessionize")(spark, sf())
        .select($"user_id", $"session_start_us", $"session_end_us", $"n_events", $"total_value")
        .as[(Long, Long, Long, Long, Double)].collect()

      assert(batch.nonEmpty && streamed.size == batch.length,
        s"session count: streaming ${streamed.size} vs batch ${batch.length}")
      batch.foreach { case (u, s0, s1, n, v) =>
        val key = (u, s0, s1)
        assert(streamed.contains(key), s"batch session $key missing from streaming output")
        val (sn, sv) = streamed(key)
        assert(sn == n, s"event count mismatch for session $key: $sn vs $n")
        assert(math.abs(sv - v) < 1e-6, s"value mismatch for session $key: $sv vs $v")
      }
    } finally q.stop()
  }
}
