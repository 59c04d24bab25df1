package graft.streaming

import graft.SparkSpec
import graft.dedup.MinHashLsh
import java.nio.file.Files

/** D30 — streaming near-dup gate: per-batch verdicts equal the batch
  * core on the same index, exact copies and light edits are caught,
  * novel documents pass, and the same-id guard holds.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val cfg = MinHashLsh.Config()

  /** Per-seed Caesar shift of a fixed sentence: different seeds (mod
    * 26) produce essentially disjoint character-trigram sets, so only
    * planted copies/edits are near — digit-heavy synthetic tokens
    * would share one trigram pool across all seeds and alias
    * everything to jaccard ≈ 1.
    */
  private def doc(seed: Int): String = {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "with many more words to shingle for a stable minhash signature"
    base.map(c => if (c == ' ') ' ' else ('a' + ((c - 'a' + seed) % 26)).toChar)
  }

  test("exact copies and light edits are flagged, novel docs pass; stream equals batch core") {
    val in = Files.createTempDirectory("graft_ndin").toString
    val out = Files.createTempDirectory("graft_ndout").toString
    val cp = Files.createTempDirectory("graft_ndcp").toString

    val corpus = (0L until 20L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    val index = StreamingNearDup.buildIndex(corpus, "doc_id", "text", cfg).persist()
    try {
      def jsonl(docs: Seq[(Long, String)]): String =
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n")
      // batch 0: an exact copy of corpus doc 3, a light edit of doc 7,
      // and a novel doc
      val b0 = Seq(
        (100L, doc(3)),
        (101L, doc(7) + " extra tail word"),
        (102L, doc(21)))
      Files.writeString(java.nio.file.Paths.get(in, "b0.jsonl"), jsonl(b0))
      StreamingNearDup.start(spark, in, index, out, cp, threshold = 0.8, cfg = cfg)
        .awaitTermination(60000)
      // batch 1: another exact copy
      val b1 = Seq((200L, doc(11)))
      Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), jsonl(b1))
      StreamingNearDup.start(spark, in, index, out, cp, threshold = 0.8, cfg = cfg)
        .awaitTermination(60000)

      val got = spark.read.parquet(out)
        .select("batch_no", "doc_id", "dup_of", "jaccard")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
      // the exact copies must surface with jaccard 1.0 against their source
      assert(got.exists(r => r._2 == 100L && r._3 == 3L && r._4 == 1.0),
        s"exact copy not flagged: ${got.mkString(", ")}")
      assert(got.exists(r => r._1 == 1L && r._2 == 200L && r._3 == 11L && r._4 == 1.0))
      // the light edit is near but not exact
      val edit = got.filter(r => r._2 == 101L && r._3 == 7L)
      assert(edit.nonEmpty && edit.head._4 >= 0.8 && edit.head._4 < 1.0,
        s"light edit: ${edit.mkString(", ")}")
      // the novel doc never appears
      assert(!got.exists(_._2 == 102L), s"novel doc flagged: ${got.mkString(", ")}")

      // stream batch 0 ≡ the batch core on the same rows, bit-for-bit
      val core = StreamingNearDup.verdicts(b0.toDF("doc_id", "text"), index, 0.8, cfg)
        .select(col("doc_id"), col("dup_of"), col("jaccard"))
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val streamed0 = got.filter(_._1 == 0L).map(r => (r._2, r._3, r._4)).toSeq
      assert(streamed0 === core)
    } finally index.unpersist()
  }

  test("a batch doc with an id already in the index never self-matches") {
    val corpus = (0L until 5L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    val index = StreamingNearDup.buildIndex(corpus, "doc_id", "text", cfg).persist()
    try {
      // same id AND same text as index doc 2: the identity guard must
      // drop the self-pair, but the copy still matches OTHER near docs
      // only if genuinely near (none here)
      val batch = Seq((2L, doc(2))).toDF("doc_id", "text")
      val v = StreamingNearDup.verdicts(batch, index, 0.8, cfg).collect()
      assert(!v.exists(r => r.getAs[Long]("doc_id") == 2L && r.getAs[Long]("dup_of") == 2L),
        s"self-match leaked: ${v.mkString(", ")}")
    } finally index.unpersist()
  }

  test("threshold gates the verdict set monotonically") {
    val corpus = (0L until 10L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    val index = StreamingNearDup.buildIndex(corpus, "doc_id", "text", cfg).persist()
    try {
      val batch = Seq((300L, doc(4) + " small change")).toDF("doc_id", "text")
      val loose = StreamingNearDup.verdicts(batch, index, 0.5, cfg).count()
      val tight = StreamingNearDup.verdicts(batch, index, 0.99, cfg).count()
      assert(loose >= tight)
      assert(loose >= 1L, "the light edit must clear the loose threshold")
    } finally index.unpersist()
  }
}
