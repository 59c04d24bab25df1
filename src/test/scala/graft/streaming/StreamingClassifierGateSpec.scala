package graft.streaming

import graft.SparkSpec
import graft.functions.Perceptron
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** D42 — streaming trained-classifier gate: stream verdicts equal the
  * batch scoring path under the same persisted model, retries rewrite
  * only their own partition, and a keep-rate collapse trips the
  * retrain gate.
  */
class StreamingClassifierGateSpec extends SparkSpec {
  import spark.implicits._

  // planted vocabulary (the CorpusPipelineSpec corpus): positives and
  // negatives are equal length but draw from disjoint token sets, so
  // the label is learnable from content only
  private def doc(i: Long, pos: Boolean): (Long, String) = {
    val pfx = if (pos) "p" else "n"
    (i, Seq.tabulate(30)(j => s"$pfx${(i * 7 + j) % 50}").mkString(" "))
  }

  private def trainAndSave(): String = {
    val corpus = (1L to 40L).map(i => doc(i, i % 2 == 0)).toDF("doc_id", "text")
    val model = Perceptron.trainBatch(corpus, "doc_id", "text",
      posLabel = col("doc_id") % 2 === 0, buckets = 256, epochs = 3)
    val dir = Files.createTempDirectory("graft_cg_model").toString
    Perceptron.save(model, dir, spark)
    dir
  }

  private def jsonl(docs: Seq[(Long, String)]): String =
    docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n")

  test("stream verdicts equal batch scoring; a mixed batch does not gate") {
    val modelDir = trainAndSave()
    val in = Files.createTempDirectory("graft_cg_in").toString
    val out = Files.createTempDirectory("graft_cg_out").toString
    val mon = Files.createTempDirectory("graft_cg_mon").toString
    val cp = Files.createTempDirectory("graft_cg_cp").toString

    // arrivals drawn from the SAME mixture as training (half keep)
    val arrivals = (100L to 119L).map(i => doc(i, i % 2 == 0))
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(arrivals))
    StreamingClassifierGate.start(spark, in, modelDir, out, mon, cp,
      refKeptFrac = 0.5, driftAlarm = 0.3).awaitTermination(60000)

    val streamed = spark.read.parquet(out)
      .select("doc_id", "margin", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    val model = Perceptron.load(spark, modelDir)
    val batchDf = arrivals.toDF("doc_id", "text")
    val batch = batchDf.select(col("doc_id"))
      .join(Perceptron.score(batchDf, "doc_id", "text", model), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("margin"), lit(0L)).as("margin"),
        (coalesce(col("margin"), lit(0L)) > 0L).as("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed === batch, "stream and batch scoring must agree under one model")

    val m = spark.read.parquet(mon).where($"batch_no" === 0L).collect().head
    assert(m.getAs[Long]("n_docs") === 20L)
    assert(math.abs(m.getAs[Double]("kept_frac") - 0.5) <= 0.2)
    assert(!m.getAs[Boolean]("retrain_gate"),
      "in-distribution arrivals must not trip the retrain gate")

    // retry idempotence: replaying batch 0 rewrites only its own
    // partition with identical content
    val before = spark.read.parquet(out)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    StreamingClassifierGate.scoreBatch(batchDf, 0L, model, out, mon, 0.5, 0.3)
    val after = spark.read.parquet(out)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(after === before, "an at-least-once replay must land identical content")
  }

  test("a keep-rate collapse trips the retrain gate; zeroed stats on all-drop batches") {
    val modelDir = trainAndSave()
    val model = Perceptron.load(spark, modelDir)
    val out = Files.createTempDirectory("graft_cg_out2").toString
    val mon = Files.createTempDirectory("graft_cg_mon2").toString

    // every arrival from the NEGATIVE vocabulary: keep rate 0 vs the
    // 0.5 reference — drift 0.5 > alarm 0.3
    val drop = (200L to 219L).map(i => doc(i, pos = false)).toDF("doc_id", "text")
    StreamingClassifierGate.scoreBatch(drop, 0L, model, out, mon, 0.5, 0.3)
    val m = spark.read.parquet(mon).where($"batch_no" === 0L).collect().head
    assert(m.getAs[Long]("n_kept") === 0L)
    assert(m.getAs[Double]("kept_frac") === 0.0)
    assert(m.getAs[Boolean]("retrain_gate"),
      "an out-of-distribution keep-rate collapse must fire the retrain signal")
  }
}
