package graft.streaming

import graft.SparkSpec
import graft.functions.{PortableBloom, TextFunctions}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D9 — streaming decontamination against a static benchmark bloom:
  * two JSONL drops processed as separate micro-batches must produce
  * exactly the per-doc verdicts of the batch decontaminate call over
  * the same docs, with the bloom's no-false-negative guarantee held
  * on every row, and a micro-batch retry must not double-write.
  */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val M = 1 << 16
  private val N = 4 // 4-gram for short spec docs

  // the "benchmark" set whose grams must not leak into training
  private lazy val benchmark = Seq(
    (900L, "the capital of france is paris and the capital of italy is rome"),
    (901L, "water boils at one hundred degrees celsius at sea level pressure")
  ).toDF("doc_id", "text")

  // b1: doc 11 quotes a benchmark sentence (contaminated), doc 12 is
  // clean. b2: doc 21 quotes the other benchmark doc, doc 22 clean.
  private val b1 = Seq(
    (11L, "trivia time the capital of france is paris and the capital of italy is rome says the quiz"),
    (12L, "a completely unrelated paragraph describing restaurant menus and appetizer prices"))
  private val b2 = Seq(
    (21L, "remember water boils at one hundred degrees celsius at sea level pressure every time"),
    (22L, "another clean document about spark structured streaming and stateful operators"))

  private def jsonl(rows: Seq[(Long, String)]): String =
    rows.map { case (id, tx) => s"""{"doc_id":$id,"text":"$tx"}""" }.mkString("\n")

  test("two streamed drops == batch decontaminate; no false negatives; retry idempotent") {
    val in = Files.createTempDirectory("graft_dec_in").toString
    val vDir = Files.createTempDirectory("graft_dec_v").toString + "/verdicts"
    val cp = Files.createTempDirectory("graft_dec_cp").toString

    val benchGrams = benchmark.select(
      explode(TextFunctions.wordShingles(col("text"), N)).as("gram")).distinct()
    val bloom = PortableBloom.build(benchGrams, "gram", K, M)

    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingDecontaminate.start(spark, in, bloom, vDir, cp, K, M, N)
      .awaitTermination(120000)
    Files.writeString(java.nio.file.Paths.get(in, "b2.jsonl"), jsonl(b2))
    StreamingDecontaminate.start(spark, in, bloom, vDir, cp, K, M, N)
      .awaitTermination(120000)

    val streamed = spark.read.parquet(vDir)
      .select("doc_id", "n_grams", "n_flagged", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    // batch twin over the union of both drops
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batch = PortableBloom.decontaminate(all, "doc_id", "text", bloom, K, M, N)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")

    // semantic spot checks: quoting docs flagged, clean docs' exact
    // share is zero (bloom may false-positive, never false-negative)
    assert(streamed(11L)._3 && streamed(21L)._3)
    val exactShared = all.select(col("doc_id"),
        explode(TextFunctions.wordShingles(col("text"), N)).as("gram")).distinct()
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exactShared.foreach { case (id, n) =>
      assert(streamed(id)._2 >= n, s"doc $id: bloom flagged ${streamed(id)._2} < exact $n")
    }

    // retry idempotence: re-running batch 1's body must leave batch
    // 1's partition identical (dynamic overwrite of its own partition)
    StreamingDecontaminate.flagBatch(b1.toDF("doc_id", "text"), 0L, bloom, vDir, K, M, N)
    val after = spark.read.parquet(vDir)
      .select("doc_id", "n_grams", "n_flagged", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(after == streamed)
  }
}
