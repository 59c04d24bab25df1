package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxLog

/** D26 — exactly-once streaming delivery into a TxLog table: a real
  * file-source stream feeds the sink across TWO sessions with a cold
  * restart between (fresh checkpoint, so earlier batch ids are
  * RE-DELIVERED — the at-least-once window made real, not simulated),
  * and the txn watermark must keep every re-delivered batch a no-op
  * while genuinely new data lands.
  */
class StreamingTxLogSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String)]): String =
    rows.map { case (k, s) => s"""{"k":$k,"s":"$s"}""" }.mkString("\n")

  private def runSession(base: String, tag: String, table: String,
                         drops: Seq[Seq[(Long, String)]]): Unit = {
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    val src = spark.readStream.schema("k BIGINT, s STRING").json(in)
    val q = StreamingTxLog.start(src, table, s"$base/ckpt_$tag", app = "loader")
    try {
      drops.zipWithIndex.foreach { case (rows, i) =>
        Files.writeString(Paths.get(in, s"${tag}_d$i.jsonl"), jsonl(rows))
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("cold restart re-delivers batches; txn watermark keeps them no-ops") {
    val base = Files.createTempDirectory("graft_txstream").toString
    val table = s"$base/table"
    TxLog.create(spark, Seq.empty[(Long, String)].toDF("k", "s"), table)

    // session 1: two micro-batches (ids 0, 1)
    runSession(base, "s1", table,
      Seq(Seq((1L, "a"), (2L, "b")), Seq((3L, "c"))))
    assert(TxLog.read(spark, table).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxLog.snapshot(table, None).txns("loader") === 1L)

    // session 2: FRESH checkpoint over the SAME source dir — the file
    // source re-reads every old file as batch 0 (re-delivery), plus a
    // new drop in the same batch. Batch 0 ≤ watermark 1 → skipped
    // entirely, INCLUDING the new rows bundled into it; the follow-up
    // drop arrives as batch 1 — also ≤ watermark — and then batch 2
    // carries the genuinely new data through.
    val in = s"$base/in"
    Files.writeString(Paths.get(in, "s2_d0.jsonl"), jsonl(Seq((4L, "d"))))
    val src = spark.readStream.schema("k BIGINT, s STRING").json(in)
    val q = StreamingTxLog.start(src, table, s"$base/ckpt_s2", app = "loader")
    try {
      q.processAllAvailable() // batch 0: replays 1..4 — skipped (0 ≤ 1)
      Files.writeString(Paths.get(in, "s2_d1.jsonl"), jsonl(Seq((5L, "e"))))
      q.processAllAvailable() // batch 1: skipped too (1 ≤ 1)
      Files.writeString(Paths.get(in, "s2_d2.jsonl"), jsonl(Seq((6L, "f"))))
      q.processAllAvailable() // batch 2: genuinely new — lands
    } finally q.stop()

    val rows = TxLog.read(spark, table).as[(Long, String)].collect().toSet
    assert(rows.contains((6L, "f")), "post-watermark batch must land")
    assert(!rows.contains((4L, "d")) && !rows.contains((5L, "e")),
      "batches at or below the watermark are no-ops even when they carry new rows " +
        "(the price of batch-granularity idempotence — documented)")
    assert(rows.count(_._1 <= 3L) === 3, "no duplicates from re-delivered batches")
    assert(TxLog.snapshot(table, None).txns("loader") === 2L)
  }

  test("driver-level replay of one batch commit is idempotent") {
    val base = Files.createTempDirectory("graft_txstream2").toString
    val table = s"$base/table"
    TxLog.create(spark, Seq((0L, "z")).toDF("k", "s"), table)
    val b = Seq((1L, "a")).toDF("k", "s")
    assert(StreamingTxLog.commitBatch(b, table, "app", 0L))
    assert(!StreamingTxLog.commitBatch(b, table, "app", 0L))
    assert(TxLog.read(spark, table).where(col("k") === 1L).count() === 1L)
  }
}
