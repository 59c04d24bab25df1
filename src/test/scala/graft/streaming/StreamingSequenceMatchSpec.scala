package graft.streaming

import graft.SparkSpec
import graft.operators.SequenceMatch
import graft.operators.SequenceMatch.{Step, One, Plus, Star}
import java.nio.file.Files

/** D20 — streaming row-pattern matching: live final+tentative match
  * counts must equal the batch SequenceMatch over every event seen so
  * far, across arbitrary micro-batch splits and arrival inversions;
  * with a watermark, resolved prefixes leave state (bounded memory)
  * and finalized counts are monotone.
  */
class StreamingSequenceMatchSpec extends SparkSpec {
  import spark.implicits._

  private val Pattern = Seq(Step("view", Plus), Step("click", Star), Step("purchase", One))

  private def jsonl(rows: Seq[(Long, String, Long, String)]): String =
    rows.map { case (id, ts, u, t) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"$t","value":1.0}"""
    }.mkString("\n")

  private def batchCount(rows: Seq[(Long, String, Long, String)], user: Long): Long = {
    val df = rows.map { case (id, ts, u, t) =>
      (u, java.sql.Timestamp.valueOf(ts.replace('T', ' ')).getTime * 1000L, id, t)
    }.toDF("user_id", "ts_us", "event_id", "event_type")
    SequenceMatch.matches(df, "user_id", "event_id", "ts_us", "event_type", Pattern)
      .filter(s"user_id = $user").count()
  }

  // ---------------------------------------------------------- resolveCut

  private def atoms = SequenceMatch.compile(Pattern,
    Map("view" -> 0, "click" -> 1, "purchase" -> 2))

  test("resolveCut resolves only attempts whose NFA died inside the immutable prefix") {
    // view view purchase | view  (fIdx = 3: last event mutable)
    val syms = Array(0, 0, 2, 0)
    // attempt at 0 matches [0..2] and the mask dies ON the purchase?
    // No: after consuming purchase the mask holds the accept state
    // only — transition from accept consumes nothing more, so the
    // mask dies at the NEXT event (index 3), which is ≥ fIdx.
    val (f1, c1) = SequenceMatch.resolveCut(atoms, syms, fIdx = 3, skipPastLastRow = true)
    assert(f1 === 0 && c1 === 0, "a match whose death lands in the mutable tail must wait")
    // with the whole buffer immutable except nothing — fIdx = 4 —
    // the death at index 3 is still not < 4? it is: died=3 < 4 →
    // resolved; then the attempt at 3 (view, alive at end) blocks
    val (f2, c2) = SequenceMatch.resolveCut(atoms, syms, fIdx = 4, skipPastLastRow = true)
    assert(f2 === 1 && c2 === 3)
  }

  test("resolveCut: failed attempts resolve one row at a time") {
    // clicks can never start a match; attempts die immediately
    val syms = Array(1, 1, 1)
    val (f, c) = SequenceMatch.resolveCut(atoms, syms, fIdx = 2, skipPastLastRow = true)
    // attempts at 0 and 1 die at their own position (< 2); the attempt
    // at 2 dies at 2 which is not < 2 → stop
    assert(f === 0 && c === 2)
  }

  test("resolveCut: foreign symbols break and resolve like the batch scan") {
    // view purchase error view — the error kills any attempt alive at it
    val syms = Array(0, 2, -1, 0)
    val (f, c) = SequenceMatch.resolveCut(atoms, syms, fIdx = 3, skipPastLastRow = true)
    // attempt at 0: view → purchase accepts at 1, error at 2 kills the
    // mask (died=2 < 3) → final match, cut = 2; attempt at 2 (error)
    // dies at 2 < 3 → cut 3; attempt at 3 unresolved
    assert(f === 1 && c === 3)
  }

  // ---------------------------------------------------------- streaming

  test("exact mode: final+tentative equals the batch match count across out-of-order batches") {
    val dir = Files.createTempDirectory("graft_seqmatch").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = StreamingSequenceMatch.matches(src, Pattern)
      .writeStream.format("memory").queryName("seq_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }
    def latest(): Map[Long, StreamingSequenceMatch.SeqMatchUpdate] =
      spark.table("seq_updates").as[StreamingSequenceMatch.SeqMatchUpdate]
        .collect().groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(r => r.n_final + r.n_buffered) }

    // the purchase ARRIVES FIRST; its views arrive in the next batch —
    // an arrival-order matcher would see purchase-then-views and emit
    // nothing; the event-time re-scan must assemble view+ purchase
    val drop1 = Seq(
      (10L, "2024-01-01T00:00:40.000", 1L, "purchase"),
      (11L, "2024-01-01T00:01:00.000", 1L, "view"),
      (12L, "2024-01-01T00:00:05.000", 2L, "view"))
    val drop2 = Seq(
      (13L, "2024-01-01T00:00:10.000", 1L, "view"),
      (14L, "2024-01-01T00:00:20.000", 1L, "click"),
      (15L, "2024-01-01T00:01:30.000", 1L, "purchase"),
      (16L, "2024-01-01T00:00:50.000", 2L, "purchase"))
    drop("b1.jsonl", drop1)
    val after1 = latest()
    assert(after1(1L).n_final + after1(1L).n_tentative === 0L,
      "purchase before any view matches nothing")
    drop("b2.jsonl", drop2)
    val after2 = latest()
    q.stop()

    val all = drop1 ++ drop2
    for (u <- Seq(1L, 2L)) {
      val expected = batchCount(all, u)
      assert(after2(u).n_final + after2(u).n_tentative === expected,
        s"user $u: stream ${after2(u)} vs batch $expected")
    }
    // user 1's events: view(10s) click(20s) purchase(40s) → match;
    // view(60s) purchase(90s) → second match
    assert(after2(1L).n_final + after2(1L).n_tentative === 2L)
    assert(after2.values.forall(_.n_late_dropped === 0L), "exact mode drops nothing")
  }

  test("watermark mode: resolved prefixes leave state, finals are monotone, beyond-floor arrivals drop") {
    val dir = Files.createTempDirectory("graft_seqmatch_wm").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = StreamingSequenceMatch.matches(src, Pattern, lateness = Some("1 hour"))
      .writeStream.format("memory").queryName("seq_wm_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }
    def latestRow(): StreamingSequenceMatch.SeqMatchUpdate = {
      val rows = spark.table("seq_wm_updates")
        .as[StreamingSequenceMatch.SeqMatchUpdate].collect().filter(_.user_id == 1L)
      rows.last
    }

    // day-1 morning: a complete journey, then a foreign event that
    // kills the attempt (so it can finalize once the frontier passes)
    drop("b1.jsonl", Seq(
      (1L, "2024-01-01T08:00:00.000", 1L, "view"),
      (2L, "2024-01-01T08:05:00.000", 1L, "click"),
      (3L, "2024-01-01T08:10:00.000", 1L, "purchase"),
      (4L, "2024-01-01T08:15:00.000", 1L, "error")))
    val a1 = latestRow()
    assert(a1.n_final === 0L && a1.n_tentative === 1L,
      s"nothing finalizes before the watermark passes (got $a1)")

    // afternoon traffic pushes the frontier (15:00 − 1 h = 14:00) past
    // the whole morning: the match and the dead positions resolve
    drop("b2.jsonl", Seq((5L, "2024-01-01T15:00:00.000", 1L, "view")))
    drop("b3.jsonl", Seq((6L, "2024-01-01T15:10:00.000", 1L, "purchase")))
    val a3 = latestRow()
    assert(a3.n_final === 1L, s"morning match must finalize (got $a3)")
    assert(a3.n_buffered <= 2L,
      s"resolved morning must leave the buffer (got ${a3.n_buffered})")
    assert(a3.n_final + a3.n_tentative === 2L, "afternoon view+purchase is tentative")

    // a beyond-floor straggler (07:00 day 1, far below the resolved
    // prefix) cannot splice into finalized history: dropped + counted
    drop("b4.jsonl", Seq((7L, "2024-01-01T07:00:00.000", 1L, "view")))
    val a4 = latestRow()
    q.stop()
    assert(a4.n_late_dropped === 1L, s"beyond-floor arrival must drop (got $a4)")
    assert(a4.n_final === 1L && a4.n_final + a4.n_tentative === 2L,
      "a dropped straggler must not disturb resolved or tentative matches")
  }

  test("a late event inside the lateness window re-segments tentative matches") {
    val dir = Files.createTempDirectory("graft_seqmatch_late").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = StreamingSequenceMatch.matches(src, Pattern, lateness = Some("2 hours"))
      .writeStream.format("memory").queryName("seq_late_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }
    def latestRow(): StreamingSequenceMatch.SeqMatchUpdate =
      spark.table("seq_late_updates")
        .as[StreamingSequenceMatch.SeqMatchUpdate].collect().filter(_.user_id == 1L).last

    // purchase at 10:20 with no prior view: no match yet
    drop("b1.jsonl", Seq((1L, "2024-01-01T10:20:00.000", 1L, "purchase")))
    assert(latestRow().n_tentative === 0L)
    // the view arrives late (event time 10:00, inside 2 h lateness):
    // the re-scan must now find view→purchase
    drop("b2.jsonl", Seq((2L, "2024-01-01T10:00:00.000", 1L, "view")))
    val a2 = latestRow()
    q.stop()
    assert(a2.n_final + a2.n_tentative === 1L,
      s"late view inside lateness must complete the match (got $a2)")
    assert(a2.n_late_dropped === 0L)
  }
}
