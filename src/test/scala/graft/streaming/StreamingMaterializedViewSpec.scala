package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D14 — live materialized view: after EVERY micro-batch the
  * incrementally-maintained aggregate must equal a full recompute
  * over the snapshot served at that version — including a group
  * migration (an update moving a row between groups), a NULL-valued
  * insert (null-sum bookkeeping), and a group vanishing when its
  * last row is deleted. Retries idempotent; view versions
  * time-travel in step with snapshot versions.
  */
class StreamingMaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  // groups: x = {k1:10, k2:20}, y = {k3:30}
  private lazy val base = Seq(
    (1L, 10L, "x"), (2L, 20L, "x"), (3L, 30L, "y")).toDF("k", "v", "s")

  private def jsonl(rows: Seq[(Long, Long, Option[Long], String, Boolean)]): String =
    rows.map { case (seq, k, v, s, del) =>
      s"""{"seq":$seq,"k":$k,"v":${v.map(_.toString).getOrElse("null")},"s":"$s","_delete":$del}"""
    }.mkString("\n")

  private def snap(df: DataFrame): Map[String, (Long, Option[Long], Long)] =
    df.collect().map(r => r.getAs[String]("s") ->
      ((r.getAs[Long]("n_rows"),
        Option(r.getAs[java.lang.Long]("sum_v")).map(_.longValue),
        r.getAs[Long]("nn_v")))).toMap

  private def recompute(snapshot: DataFrame): Map[String, (Long, Option[Long], Long)] =
    snap(IncrementalAgg.init(snapshot, Seq("s"), Seq("v")))

  test("view tracks full recompute across micro-batches; retries idempotent") {
    val in = Files.createTempDirectory("graft_mv_in").toString
    val snapDir = Files.createTempDirectory("graft_mv_sn").toString + "/snap"
    val viewDir = Files.createTempDirectory("graft_mv_vw").toString + "/view"
    val cp = Files.createTempDirectory("graft_mv_cp").toString

    StreamingMaterializedView.init(base, snapDir, viewDir, Seq("s"), Seq("v"))
    assert(snap(StreamingMaterializedView.view(spark, viewDir)) ===
      Map("x" -> ((2L, Some(30L), 2L)), "y" -> ((1L, Some(30L), 1L))))

    // b1: k2 MIGRATES group x→y with a new value (retract from x,
    // insert into y), k3 deleted, k4 inserted into y with NULL v
    // (n_rows advances, sum doesn't). LWW: seq 11 beats seq 10 on k2.
    val b1 = Seq(
      (10L, 2L, Option(21L), "x", false),
      (11L, 2L, Option(22L), "y", false),
      (12L, 3L, Option(30L), "y", true),
      (13L, 4L, Option.empty[Long], "y", false))
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingMaterializedView.start(spark, in, snapDir, viewDir, cp, Seq("s"), Seq("v"))
      .awaitTermination(120000)

    val afterB1 = snap(StreamingMaterializedView.view(spark, viewDir))
    assert(afterB1 === recompute(StreamingCdc.snapshot(spark, snapDir)))
    assert(afterB1 === Map(
      "x" -> ((1L, Some(10L), 1L)),            // k1 alone after the migration
      "y" -> ((2L, Some(22L), 1L))))           // k2 (22) + k4 (null v)

    // b2: delete k1 (group x VANISHES), k4's null v becomes 50
    val b2 = Seq(
      (20L, 1L, Option(10L), "x", true),
      (21L, 4L, Option(50L), "y", false))
    Files.writeString(java.nio.file.Paths.get(in, "b2.jsonl"), jsonl(b2))
    StreamingMaterializedView.start(spark, in, snapDir, viewDir, cp, Seq("s"), Seq("v"))
      .awaitTermination(120000)

    val afterB2 = snap(StreamingMaterializedView.view(spark, viewDir))
    assert(afterB2 === recompute(StreamingCdc.snapshot(spark, snapDir)))
    assert(afterB2 === Map("y" -> ((2L, Some(72L), 2L))),
      "x must vanish with its last row; k4's sum joins once its value is non-null")

    // retry of the last micro-batch: same batchId, both states pinned
    // to committed < batchId — nothing may change
    val retryBatch = b2.map { case (seq, k, v, s, del) =>
      (seq, k, v.getOrElse(-1L), s, del) }.toDF("seq", "k", "v", "s", "_delete")
      .withColumn("v", when(col("v") === -1L, lit(null).cast("long")).otherwise(col("v")))
    StreamingMaterializedView.applyBatch(spark, retryBatch, batchId = 1L,
      snapDir, viewDir, Seq("s"), Seq("v"))
    assert(snap(StreamingMaterializedView.view(spark, viewDir)) === afterB2,
      "retry must rewrite its own version, not fork the view")

    // time travel: every committed view version equals the recompute
    // over its snapshot twin
    for (n <- Seq(-1L, 0L, 1L))
      assert(snap(StreamingMaterializedView.viewAt(spark, viewDir, n)) ===
        recompute(StreamingCdc.snapshotAt(spark, snapDir, n)),
        s"view version $n diverged from its snapshot twin")
  }

  test("view history is vacuumable with the shared versioned-dir layout") {
    val in = Files.createTempDirectory("graft_mv3_in").toString
    val snapDir = Files.createTempDirectory("graft_mv3_sn").toString + "/snap"
    val viewDir = Files.createTempDirectory("graft_mv3_vw").toString + "/view"
    val cp = Files.createTempDirectory("graft_mv3_cp").toString

    StreamingMaterializedView.init(base, snapDir, viewDir, Seq("s"), Seq("v"))
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"),
      jsonl(Seq((10L, 1L, Option(11L), "x", false))))
    StreamingMaterializedView.start(spark, in, snapDir, viewDir, cp, Seq("s"), Seq("v"))
      .awaitTermination(120000)

    val current = snap(StreamingMaterializedView.view(spark, viewDir))
    // the view dir shares the batch_no + marker layout, so the CDC
    // vacuum applies verbatim
    assert(StreamingCdc.vacuum(spark, viewDir, keepLast = 1) === Seq(-1L))
    assert(snap(StreamingMaterializedView.view(spark, viewDir)) === current,
      "vacuum must keep the current view")
    intercept[IllegalArgumentException] {
      StreamingMaterializedView.viewAt(spark, viewDir, -1L)
    }
  }

  test("a delete of an absent key is a no-op for both states") {
    val in = Files.createTempDirectory("graft_mv2_in").toString
    val snapDir = Files.createTempDirectory("graft_mv2_sn").toString + "/snap"
    val viewDir = Files.createTempDirectory("graft_mv2_vw").toString + "/view"
    val cp = Files.createTempDirectory("graft_mv2_cp").toString

    StreamingMaterializedView.init(base, snapDir, viewDir, Seq("s"), Seq("v"))
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"),
      jsonl(Seq((10L, 99L, Option(1L), "zz", true))))
    StreamingMaterializedView.start(spark, in, snapDir, viewDir, cp, Seq("s"), Seq("v"))
      .awaitTermination(120000)
    assert(snap(StreamingMaterializedView.view(spark, viewDir)) ===
      recompute(StreamingCdc.snapshot(spark, snapDir)))
    assert(snap(StreamingMaterializedView.view(spark, viewDir)) === snap(
      IncrementalAgg.init(base, Seq("s"), Seq("v"))))
  }
}
