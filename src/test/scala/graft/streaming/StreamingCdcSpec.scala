package graft.streaming

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D10 — streaming CDC apply: two change-file drops processed as
  * separate micro-batches must land exactly the sequential batch
  * Upsert.merge result; within-batch LWW; retries idempotent.
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")).toDF("k", "v", "s")

  private def jsonl(rows: Seq[(Long, Long, Long, String, Boolean)]): String =
    rows.map { case (seq, k, v, s, del) =>
      s"""{"seq":$seq,"k":$k,"v":$v,"s":"$s","_delete":$del}""" }.mkString("\n")

  test("two streamed drops == sequential batch merges; retry is idempotent") {
    val in = Files.createTempDirectory("graft_cdc_in").toString
    val snap = Files.createTempDirectory("graft_cdc_sn").toString + "/snap"
    val cp = Files.createTempDirectory("graft_cdc_cp").toString

    StreamingCdc.initSnapshot(base, snap)

    // b1: update k=2, delete k=3, insert k=4.
    // b1 also carries TWO versions of k=2 — seq 11 must win.
    val b1 = Seq(
      (10L, 2L, 21L, "b1", false),
      (11L, 2L, 22L, "b2", false),
      (12L, 3L, 30L, "c", true),
      (13L, 4L, 40L, "d", false))
    // b2: re-insert k=3, update the k=4 inserted by b1 (proves the
    // snapshot advanced between micro-batches).
    val b2 = Seq(
      (20L, 3L, 33L, "c2", false),
      (21L, 4L, 44L, "d2", false))

    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingCdc.start(spark, in, snap, cp).awaitTermination(120000)
    Files.writeString(java.nio.file.Paths.get(in, "b2.jsonl"), jsonl(b2))
    StreamingCdc.start(spark, in, snap, cp).awaitTermination(120000)

    // batch twin: same changes through Upsert.merge sequentially
    // (within-batch LWW applied the same way)
    val u1 = Seq((2L, 22L, "b2", false), (3L, 30L, "c", true), (4L, 40L, "d", false))
      .toDF("k", "v", "s", "_delete")
    val s1 = Upsert.merge(base, u1, Seq("k"))
      .filter(col("op") =!= "delete").drop("op")
    val u2 = Seq((3L, 33L, "c2", false), (4L, 44L, "d2", false))
      .toDF("k", "v", "s", "_delete")
    val s2 = Upsert.merge(s1, u2, Seq("k"))
      .filter(col("op") =!= "delete").drop("op")

    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("v"), r.getAs[String]("s"))).toMap

    val streamed = StreamingCdc.snapshot(spark, snap)
    assert(keyed(streamed) == keyed(s2))
    assert(keyed(streamed)(2L) == ((22L, "b2")), "within-batch LWW: seq 11 beat seq 10")
    assert(keyed(streamed)(4L) == ((44L, "d2")), "b2 updated the key b1 inserted")
    assert(!keyed(StreamingCdc.snapshot(spark, snap)).contains(5L))

    // retry of the last micro-batch: same batchId, same snapshot
    val before = keyed(StreamingCdc.snapshot(spark, snap))
    StreamingCdc.applyBatch(spark,
      u2.withColumn("seq", monotonically_increasing_id() + 20L), batchId = 1L, snap)
    val after = keyed(StreamingCdc.snapshot(spark, snap))
    assert(before == after, "retry must rewrite its own partition, not fork state")

    // time-travel: the pre-b2 snapshot is still readable at batch_no=0
    val historic = spark.read.parquet(snap).filter(col("batch_no") === 0L)
    assert(keyed(historic.drop("batch_no")) == keyed(s1))

    // a partially-written partition (no _COMMITTED_ marker — the
    // residue of an attempt that died mid-write) must be invisible to
    // snapshot(): it still serves the last COMMITTED batch
    val partial = java.nio.file.Paths.get(snap, "batch_no=99")
    Files.createDirectories(partial)
    s2.limit(1).write.mode("overwrite").parquet(partial.toString)
    assert(keyed(StreamingCdc.snapshot(spark, snap)) == before,
      "snapshot must ignore a marker-less (uncommitted) partition")

    // time travel reads any retained committed version
    assert(keyed(StreamingCdc.snapshotAt(spark, snap, -1L)) == keyed(base))
    assert(keyed(StreamingCdc.snapshotAt(spark, snap, 0L)) == keyed(s1))
    intercept[IllegalArgumentException](StreamingCdc.snapshotAt(spark, snap, 99L))

    // vacuum(keepLast=1): history and the crashed-attempt residue
    // below the newest commit go; the current snapshot still serves
    val removed = StreamingCdc.vacuum(spark, snap, keepLast = 1)
    assert(removed === Seq(-1L, 0L))
    assert(keyed(StreamingCdc.snapshot(spark, snap)) == before,
      "vacuum must never touch the current snapshot")
    intercept[IllegalArgumentException](StreamingCdc.snapshotAt(spark, snap, 0L))
    val leftDirs = new java.io.File(snap).listFiles.map(_.getName)
      .filter(_.startsWith("batch_no=")).toSet
    assert(leftDirs === Set("batch_no=1", "batch_no=99"),
      "only the retained version survives below the newest commit; an " +
        "in-flight partition above it is left alone")
  }
}
