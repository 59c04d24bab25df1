package graft.streaming

import graft.SparkSpec
import graft.dedup.{IncrementalDedup, MinHashLsh}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D8 — streaming incremental ingest: two JSONL drops processed as
  * separate micro-batches must produce exactly the verdicts and final
  * index of the sequential batch API (dedupBatch → appendAccepted →
  * dedupBatch), and a micro-batch retry must not double-write.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = MinHashLsh.Config()
  private val t = 0.5

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"),
    (2L, "a completely different text describing restaurant menus appetizers and daily prices"),
    (3L, "an unrelated document about structured streaming watermarks and stateful operators")
  ).toDF("doc_id", "text")

  // b1: one dup of corpus doc 1, one novel. b2: one dup of the doc
  // ACCEPTED in b1 (proves the index advanced between micro-batches),
  // one novel.
  private val b1 = Seq(
    (101L, "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"),
    (102L, "zzqx vvbnm ppwor lkjhg fdsaq mnbvc xswed rfvtg byhnu jmkil olpqa wsxcd")
  )
  private val b2 = Seq(
    (201L, "zzqx vvbnm ppwor lkjhg fdsaq mnbvc xswed rfvtg byhnu jmkil olpqa wsxcd"),
    (202L, "fresh totally new content about vector indexes and band joins at corpus scale")
  )

  private def jsonl(rows: Seq[(Long, String)]): String =
    rows.map { case (id, tx) => s"""{"doc_id":$id,"text":"$tx"}""" }.mkString("\n")

  test("two streamed drops == sequential batch ingest; retry is idempotent") {
    val in = Files.createTempDirectory("graft_ing_in").toString
    val idxDir = Files.createTempDirectory("graft_ing_idx").toString + "/index"
    val vDir = Files.createTempDirectory("graft_ing_v").toString + "/verdicts"
    val cp = Files.createTempDirectory("graft_ing_cp").toString

    StreamingIngest.initIndex(corpus, idxDir, cfg = cfg)

    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
    StreamingIngest.start(spark, in, idxDir, vDir, cp, threshold = t, cfg = cfg)
      .awaitTermination(120000)
    Files.writeString(java.nio.file.Paths.get(in, "b2.jsonl"), jsonl(b2))
    StreamingIngest.start(spark, in, idxDir, vDir, cp, threshold = t, cfg = cfg)
      .awaitTermination(120000)

    // batch twin: same two batches through the q54 API, sequentially
    val idx0 = IncrementalDedup.buildIndex(corpus, cfg = cfg)
    val b1df = b1.toDF("doc_id", "text")
    val v1 = IncrementalDedup.dedupBatch(idx0, b1df, threshold = t, cfg = cfg)
    val idx1 = IncrementalDedup.appendAccepted(idx0, b1df, v1, cfg = cfg)
    val b2df = b2.toDF("doc_id", "text")
    val v2 = IncrementalDedup.dedupBatch(idx1, b2df, threshold = t, cfg = cfg)
    val idx2 = IncrementalDedup.appendAccepted(idx1, b2df, v2, cfg = cfg)

    def keyed(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select("doc_id", "is_novel", "matched_id", "n_matches")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.toString).toMap

    val streamed = spark.read.parquet(vDir)
    assert(streamed.count() == 4)
    assert(keyed(streamed) == keyed(v1.union(v2)))
    // 201 must match 102 — only possible if the index advanced
    // between micro-batches
    val r201 = streamed.filter($"doc_id" === 201L).collect().head
    assert(!r201.getAs[Boolean]("is_novel") && r201.getAs[Long]("matched_id") == 102L)

    val finalIdx = spark.read.parquet(idxDir).drop("batch_no")
    assert(finalIdx.select("doc_id").as[Long].collect().sorted.toSeq ==
      idx2.select("doc_id").as[Long].collect().sorted.toSeq)

    // retry of the last micro-batch (same batch_no) must overwrite its
    // own partition, not append a duplicate
    val before = (spark.read.parquet(vDir).count(), spark.read.parquet(idxDir).count())
    StreamingIngest.ingestBatch(spark, b2df, batchId = 1L, idxDir, vDir, t, cfg)
    val after = (spark.read.parquet(vDir).count(), spark.read.parquet(idxDir).count())
    assert(before == after, s"retry changed row counts: $before -> $after")
  }

  test("two identical docs in ONE micro-batch: one novel verdict, one index entry") {
    val idxDir = Files.createTempDirectory("graft_sb_idx").toString + "/index"
    val vDir = Files.createTempDirectory("graft_sb_v").toString + "/verdicts"
    StreamingIngest.initIndex(corpus, idxDir, cfg = cfg)

    val batch = Seq(
      (301L, "brand new content about llm corpus curation pipelines and quality signals today"),
      (302L, "brand new content about llm corpus curation pipelines and quality signals today"),
      (303L, "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"),
      (304L, "some other completely fresh and unrelated piece of writing about sailing boats")
    ).toDF("doc_id", "text")
    StreamingIngest.ingestBatch(spark, batch, batchId = 0L, idxDir, vDir, t, cfg)

    val v = spark.read.parquet(vDir)
      .select("doc_id", "is_novel", "matched_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_novel"), if (r.isNullAt(2)) -1L else r.getAs[Long]("matched_id"))).toMap
    assert(v.size == 4)
    assert(v(301L) == (true, -1L)) // the min-id keeper is the one novel copy
    assert(v(302L) == (false, 301L)) // same-batch twin: dup of the keeper
    assert(v(303L) == (false, 1L)) // corpus dup unaffected by self-dedup
    assert(v(304L) == (true, -1L))

    // exactly the two novel docs entered the index — not 302
    val appended = spark.read.parquet(idxDir)
      .filter(col("batch_no") === 0L).select("doc_id").as[Long].collect().sorted
    assert(appended.toSeq == Seq(301L, 304L))

    // retry still idempotent with the self-dedup in the loop
    val before = (spark.read.parquet(vDir).count(), spark.read.parquet(idxDir).count())
    StreamingIngest.ingestBatch(spark, batch, batchId = 0L, idxDir, vDir, t, cfg)
    val after = (spark.read.parquet(vDir).count(), spark.read.parquet(idxDir).count())
    assert(before == after, s"retry changed row counts: $before -> $after")
  }
}
