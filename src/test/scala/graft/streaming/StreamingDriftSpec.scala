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

  // ---- D32: the categorical (chi-square) arm ----

  test("categorical: weighted chiSquareCounts equals row-level chiSquare") {
    val rows = (1L to 60L).map(i => (s"c${(i * 7) % 5}", i % 3 == 0))
    val rowLevel = Stats.chiSquare(rows.toDF("c", "ia"), col("c"), col("ia")).head()
    val counts = rows.groupBy(identity).map { case (k, g) => (k._1, g.size.toLong, k._2) }.toSeq
    val weighted = Stats.chiSquareCounts(counts.toDF("c", "n", "ia"),
      col("c"), col("n"), col("ia")).head()
    assert(rowLevel.toSeq == weighted.toSeq)
  }

  test("categorical: an in-mix batch passes, a shifted mix alarms; verdict equals batch chi2") {
    val in = Files.createTempDirectory("graft_dcin").toString
    val out = Files.createTempDirectory("graft_dcout").toString
    val cp = Files.createTempDirectory("graft_dccp").toString

    // category = first character; reference mix: a/b/c/d evenly
    val cats = Seq("a", "b", "c", "d")
    val reference = (0L until 200L).map(i => (i, cats((i % 4).toInt) + "rest"))
      .toDF("doc_id", "text")
    val ref = StreamingDrift.referenceCategoryCounts(
      reference, substring(col("text"), 1, 1)).persist()
    try {
      def jsonl(docs: Seq[(Long, String)]): String =
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n")
      // batch 0: same even mix; batch 1: all mass on one category
      Files.writeString(java.nio.file.Paths.get(in, "b0.jsonl"),
        jsonl((0L until 100L).map(i => (i, cats((i % 4).toInt) + "rest"))))
      StreamingDrift.startCategorical(spark, in, ref, out, cp,
        substring(col("text"), 1, 1), chi2Alarm = 30.0).awaitTermination(60000)
      Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"),
        jsonl((100L until 200L).map(i => (i, "arest"))))
      StreamingDrift.startCategorical(spark, in, ref, out, cp,
        substring(col("text"), 1, 1), chi2Alarm = 30.0).awaitTermination(60000)

      val verdicts = spark.read.parquet(out)
        .orderBy("batch_no")
        .select("drifted", "chi2").as[(Boolean, Double)].collect()
      assert(verdicts.length == 2)
      assert(!verdicts(0)._1, s"in-mix batch must not alarm: ${verdicts(0)}")
      assert(verdicts(0)._2 == 0.0, "identical mixes give exactly 0")
      assert(verdicts(1)._1, s"shifted mix must alarm: ${verdicts(1)}")

      // stream verdict ≡ batch chiSquare over reference ∪ batch-1 rows
      val rows = (0L until 200L).map(i => (cats((i % 4).toInt), true)) ++
        (0L until 100L).map(_ => ("a", false))
      val batchChi = Stats.chiSquare(rows.toDF("c", "ia"), col("c"), col("ia")).head()
      val streamed1 = spark.read.parquet(out).filter($"batch_no" === 1L).head()
      assert(java.lang.Double.doubleToLongBits(streamed1.getAs[Double]("chi2")) ==
        java.lang.Double.doubleToLongBits(batchChi.getAs[Double]("chi2")))
      assert(streamed1.getAs[Long]("k_categories") == batchChi.getAs[Long]("k_categories"))
    } finally ref.unpersist()
  }
}
