package graft.streaming

import graft.SparkSpec
import graft.functions.Stats
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** D34 — streaming robust gate: stream verdicts ≡ batch gate on the
  * same rows, spikes flag while in-band rows pass, unknown groups
  * surface, per-batch exactly-once landing.
  */
class StreamingRobustGateSpec extends SparkSpec {
  import spark.implicits._

  test("spikes flag against the standing median/MAD; stream equals batch; exactly-once") {
    val in = Files.createTempDirectory("graft_rgin").toString
    val out = Files.createTempDirectory("graft_rgout").toString
    val cp = Files.createTempDirectory("graft_rgcp").toString

    // reference corpus: values 0..49 per group (median ~25, MAD ~12)
    val corpus = (0L until 200L).map(i => (s"g${i % 2}", (i / 2) % 50)).toDF("g", "v")
    val reference = Stats.madOutliers(corpus, col("g"), col("v"), k = 3)
      .select(col("grp"), col("median"), col("mad")).persist()
    try {
      def jsonl(rows: Seq[(Long, String, Long)]): String =
        rows.map { case (id, g, v) =>
          s"""{"doc_id": $id, "grp": "$g", "value": $v}""" }.mkString("\n")
      // batch 0: in-band rows + one spike + one unknown group
      val b0 = Seq((1L, "g0", 30L), (2L, "g1", 10L), (3L, "g0", 5000L), (4L, "gX", 7L))
      Files.writeString(Paths.get(in, "b0.jsonl"), jsonl(b0))
      StreamingRobustGate.start(spark, in, reference, out, cp, k = 3).awaitTermination(60000)

      val landed = spark.read.parquet(out).orderBy("doc_id")
        .select("doc_id", "outlier", "unknown_group")
        .as[(Long, Boolean, Boolean)].collect()
      assert(landed.toSeq === Seq((1L, false, false), (2L, false, false),
        (3L, true, false), (4L, false, true)))

      // stream ≡ batch: same kernel over the same rows
      val batchSide = StreamingRobustGate.gateBatch(
        b0.toDF("doc_id", "grp", "value"), reference, 3)
        .orderBy("doc_id").collect().map(_.toSeq)
      val streamSide = spark.read.parquet(out).drop("batch_no")
        .select("doc_id", "grp", "value", "median", "mad", "unknown_group", "outlier")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(streamSide.toSeq === batchSide.toSeq)

      // retry idempotence + second drop appends only its partition
      StreamingRobustGate.ingestBatch(b0.toDF("doc_id", "grp", "value"), 0L, reference, out, 3)
      assert(spark.read.parquet(out).count() === 4L)
      Files.writeString(Paths.get(in, "b1.jsonl"), jsonl(Seq((9L, "g1", 49L))))
      StreamingRobustGate.start(spark, in, reference, out, cp, k = 3).awaitTermination(60000)
      val all = spark.read.parquet(out)
      assert(all.count() === 5L && all.select("batch_no").distinct().count() === 2L)
    } finally reference.unpersist()
  }
}
