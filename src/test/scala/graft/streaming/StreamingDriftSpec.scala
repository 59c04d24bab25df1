package graft.streaming

import graft.SparkSpec
import graft.functions.Stats
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** D29 — streaming drift monitor: per-batch KS verdicts equal the
  * batch ksTest on the same data, a shifted batch alarms while a
  * same-distribution batch does not, and the weighted count core
  * matches the row-level core.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("weighted ksTestCounts equals row-level ksTest") {
    val rows = (1L to 40L).map(i => ((i * 13) % 17, i % 4 == 0))
    val rowLevel = Stats.ksTest(rows.toDF("v", "ia"), col("v"), col("ia")).head()
    val counts = rows.groupBy(identity).map { case (k, g) => (k._1, g.size.toLong, k._2) }.toSeq
    val weighted = Stats.ksTestCounts(counts.toDF("v", "n", "ia"),
      col("v"), col("n"), col("ia")).head()
    assert(rowLevel.toSeq == weighted.toSeq)
  }

  test("an in-distribution batch passes, a shifted batch alarms; verdicts equal batch KS") {
    val in = Files.createTempDirectory("graft_drin").toString
    val out = Files.createTempDirectory("graft_drout").toString
    val cp = Files.createTempDirectory("graft_drcp").toString

    // reference: text lengths spread 10..59
    val reference = (0L until 200L).map(i => (i, "x" * (10 + (i % 50)).toInt)).toDF("doc_id", "text")
    val ref = StreamingDrift.referenceCounts(reference, length(col("text"))).persist()
    try {
      def jsonl(docs: Seq[(Long, String)]): String =
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n")
      // batch 0: same 10..59 shape; batch 1: everything doubled (shifted)
      Files.writeString(java.nio.file.Paths.get(in, "b0.jsonl"),
        jsonl((0L until 100L).map(i => (i, "x" * (10 + (i % 50)).toInt))))
      StreamingDrift.start(spark, in, ref, out, cp, dAlarm = 0.2).awaitTermination(60000)
      Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"),
        jsonl((100L until 200L).map(i => (i, "x" * (80 + (i % 50)).toInt))))
      StreamingDrift.start(spark, in, ref, out, cp, dAlarm = 0.2).awaitTermination(60000)

      val verdicts = spark.read.parquet(out)
        .orderBy("batch_no")
        .select("drifted", "d").as[(Boolean, Double)].collect()
      assert(verdicts.length == 2)
      assert(!verdicts(0)._1, s"in-distribution batch must not alarm: ${verdicts(0)}")
      assert(verdicts(1)._1, s"shifted batch must alarm: ${verdicts(1)}")
      assert(verdicts(1)._2 == 1.0) // disjoint supports: maximal drift

      // stream verdict ≡ batch ksTest over reference ∪ batch-0 rows
      val batchRows = (0L until 100L).map(i => (10L + (i % 50), false)) ++
        (0L until 200L).map(i => (10L + (i % 50), true))
      val batchKs = Stats.ksTest(batchRows.toDF("v", "ia"), col("v"), col("ia")).head()
      val streamed0 = spark.read.parquet(out).filter($"batch_no" === 0L).head()
      assert(streamed0.getAs[Double]("d") == batchKs.getAs[Double]("d"))
      assert(streamed0.getAs[Long]("d_num") == batchKs.getAs[Long]("d_num"))
    } finally ref.unpersist()
  }
}
