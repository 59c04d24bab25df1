package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IncrementalAgg
import graft.sources.TxLog

/** D27 — the closed lakehouse loop: a stream feeds a TxLog table
  * (D26), batch row-level operations mutate it, and a maintained view
  * follows through the change feed, exact at every step (maintained ≡
  * full recompute), surviving a cold maintainer restart on the stored
  * watermark.
  */
class StreamingTxLogViewSpec extends SparkSpec {
  import spark.implicits._

  private def recompute(source: String) =
    IncrementalAgg.init(TxLog.read(spark, source).withColumn("v", col("v")),
      Seq("k"), Seq("v"))

  private def assertExact(view: StreamingTxLogView, source: String): Unit = {
    val got = view.view().select("k", "n_rows", "sum_v", "nn_v")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = recompute(source).select("k", "n_rows", "sum_v", "nn_v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("view follows stream batches, deletes and upserts; restart resumes from watermark") {
    val base = Files.createTempDirectory("graft_txview").toString
    val source = s"$base/source"
    val viewT = s"$base/view"
    TxLog.create(spark, Seq.empty[(Long, String, Long)].toDF("id", "k", "v"), source)
    val view = new StreamingTxLogView(spark, source, viewT, Seq("k"), Seq("v"))

    // stream two micro-batches in via the exactly-once sink
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    def jsonl(rows: Seq[(Long, String, Long)]): String =
      rows.map { case (i, k, v) => s"""{"id":$i,"k":"$k","v":$v}""" }.mkString("\n")
    val src = spark.readStream.schema("id BIGINT, k STRING, v BIGINT").json(in)
    val q = StreamingTxLog.start(src, source, s"$base/ckpt", app = "loader")
    try {
      Files.writeString(Paths.get(in, "d0.jsonl"),
        jsonl(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))))
      q.processAllAvailable()
      view.refresh()
      assertExact(view, source)
      Files.writeString(Paths.get(in, "d1.jsonl"), jsonl(Seq((4L, "b", 40L), (5L, "c", 50L))))
      q.processAllAvailable()
      view.refresh()
      assertExact(view, source)
    } finally q.stop()

    // batch mutations through the same table
    TxLog.deleteWhere(spark, source, col("k") === "a")
    TxLog.upsert(spark, Seq((2L, "b", 200L), (6L, "d", 60L)).toDF("id", "k", "v"),
      source, "id")
    view.refresh()
    assertExact(view, source)

    // deletion-vector delete: no file rewrite, but the change feed
    // still carries the row-level deletes into the view
    TxLog.deleteWhereDV(spark, source, col("id") === 4L)
    view.refresh()
    assertExact(view, source)
    assert(!view.view().select("k").as[String].collect().contains("a"),
      "fully deleted group dropped from the view")

    // replayed refresh is a no-op; watermark == source head
    val head = TxLog.snapshot(source).version
    assert(view.appliedVersion() === head)
    val viewVersionBefore = TxLog.snapshot(viewT).version
    assert(view.refresh() === head)
    assert(TxLog.snapshot(viewT).version === viewVersionBefore, "no-op refresh commits nothing")

    // cold restart: a NEW maintainer on the same stores resumes
    val view2 = new StreamingTxLogView(spark, source, viewT, Seq("k"), Seq("v"))
    assert(view2.appliedVersion() === head, "watermark survives restart")
    TxLog.append(spark, Seq((7L, "c", 70L)).toDF("id", "k", "v"), source)
    view2.refresh()
    assertExact(view2, source)
    assert(view2.appliedVersion() === head + 1)
  }
}
