package graft.streaming

import graft.SparkSpec
import graft.functions.Blocklist
import java.nio.file.Files

/** D15 — streaming blocklist screening: two JSONL drops processed as
  * separate micro-batches must produce exactly the batch annotate
  * verdicts over the same docs, and a restart with an unchanged input
  * set must not duplicate rows (file-source checkpoint + file-sink
  * commit log).
  */
class StreamingBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val pats = Seq("banned phrase", "forbidden", "spark")

  private val b1 = Seq(
    (1L, "this text has a banned phrase and a banned phrase again"),
    (2L, "clean document about spark structured streaming"))
  private val b2 = Seq(
    (3L, "forbidden forbidden forbidden"),
    (4L, "nothing objectionable here"))

  private def jsonl(rows: Seq[(Long, String)]): String =
    rows.map { case (id, tx) => s"""{"doc_id":$id,"text":"$tx"}""" }.mkString("\n")

  test("two streamed drops == batch annotate; restart adds nothing") {
    val in = Files.createTempDirectory("graft_bl_in").toString
    val out = Files.createTempDirectory("graft_bl_out").toString + "/verdicts"
    val cp = Files.createTempDirectory("graft_bl_cp").toString

    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingBlocklist.start(spark, in, out, cp, pats).awaitTermination(120000)
    Files.writeString(java.nio.file.Paths.get(in, "b2.jsonl"), jsonl(b2))
    StreamingBlocklist.start(spark, in, out, cp, pats).awaitTermination(120000)

    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "total_hits", "n_matched", "top_pattern")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

    val streamed = collect(spark.read.parquet(out))
    val batch = collect(Blocklist.annotate(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", pats))
    assert(streamed === batch)
    assert(streamed.map(_._1) === Seq(1L, 2L, 3L, 4L)) // no duplicates
    assert(streamed(0)._2 === 2L && streamed(0)._4 === "banned phrase")
    assert(streamed(2)._2 === 3L && streamed(2)._4 === "forbidden")

    // restart with nothing new: checkpoint says both files are done
    StreamingBlocklist.start(spark, in, out, cp, pats).awaitTermination(120000)
    assert(collect(spark.read.parquet(out)) === streamed)
  }
}
