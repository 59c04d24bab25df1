package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = MinHashLsh.Config()

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away into the hills at dawn"),
    (3L, "a completely different text describing restaurant menus appetizers and daily prices"),
    (4L, "an unrelated document about structured streaming watermarks and stateful operators")
  ).toDF("doc_id", "text")

  private lazy val batch = Seq(
    (101L, "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"), // exact dup of 1
    (102L, "a completely different text describing restaurant menus appetizers and daily pricing"), // near dup of 3
    (103L, "zzqx vvbnm ppwor lkjhg fdsaq mnbvc xswed rfvtg byhnu jmkil olpqa wsxcd")              // novel
  ).toDF("doc_id", "text")

  test("verdicts: exact dup matched to its source, novel stays novel") {
    val index = IncrementalDedup.buildIndex(corpus, cfg = cfg)
    val out = IncrementalDedup.dedupBatch(index, batch, threshold = 0.5, cfg = cfg)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d101 = out(101L)
    assert(!d101.getAs[Boolean]("is_novel") && d101.getAs[Long]("matched_id") == 1L)
    assert(d101.getAs[Double]("best_jaccard") == 1.0)
    val d103 = out(103L)
    assert(d103.getAs[Boolean]("is_novel") && d103.isNullAt(d103.fieldIndex("matched_id")))
    assert(d103.getAs[Long]("n_matches") == 0L)
  }

  test("batch-vs-index equals the full-corpus dedup restricted to batch x corpus pairs") {
    // Signatures, band hashes and Jaccard are pure functions of
    // (text, seed), so matching the delta against the index must give
    // exactly what a from-scratch run over corpus ∪ batch gives for
    // the batch×corpus pairs. (The LSH skew guard counts buckets
    // per-side here vs jointly there — equivalent below the cap,
    // which test-sized data never reaches.)
    val t = 0.5
    val index = IncrementalDedup.buildIndex(corpus, cfg = cfg)
    val incremental = IncrementalDedup.matches(index, batch, threshold = t, cfg = cfg)
      .select("corpus_id", "batch_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet

    val full = MinHashLsh.nearDuplicates(corpus.union(batch), "doc_id", "text", t, cfg)
      .filter(col("id_a") <= 4L && col("id_b") >= 101L) // corpus×batch only
      .as[(Long, Long, Double)].collect().toSet

    assert(incremental.nonEmpty, "expected at least the exact-dup match")
    assert(incremental == full,
      s"incremental $incremental vs full-run-restricted $full")
  }

  test("appendAccepted == rebuilding the index from scratch over corpus + accepted docs") {
    val index = IncrementalDedup.buildIndex(corpus, cfg = cfg)
    val verdicts = IncrementalDedup.dedupBatch(index, batch, threshold = 0.5, cfg = cfg)
    val appended = IncrementalDedup.appendAccepted(index, batch, verdicts, cfg = cfg)
    val appendedRows = appended.collect().map(_.toString).sorted.toSeq

    val acceptedIds = verdicts.filter(col("is_novel")).select("doc_id").as[Long].collect().toSet
    assert(acceptedIds.contains(103L) && !acceptedIds.contains(101L))
    val rebuilt = IncrementalDedup.buildIndex(
      corpus.union(batch.filter(col("doc_id").isin(acceptedIds.toSeq: _*))), cfg = cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(appendedRows == rebuilt &&
      appendedRows.size == corpus.count().toInt + acceptedIds.size)

    // a re-ingest of the same batch against the appended index finds
    // every doc (novel ones now match themselves at jaccard 1)
    val again = IncrementalDedup.dedupBatch(appended, batch, threshold = 0.5, cfg = cfg)
    assert(again.filter(col("is_novel")).count() == 0L)
  }

  test("the index survives a parquet round-trip (persisted-index shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    IncrementalDedup.buildIndex(corpus, cfg = cfg).write.parquet(s"$dir/index")
    val reloaded = spark.read.parquet(s"$dir/index")
    val fresh = IncrementalDedup.dedupBatch(
      IncrementalDedup.buildIndex(corpus, cfg = cfg), batch, threshold = 0.5, cfg = cfg)
      .collect().map(_.toString).sorted.toSeq
    val viaDisk = IncrementalDedup.dedupBatch(reloaded, batch, threshold = 0.5, cfg = cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDisk == fresh && viaDisk.nonEmpty)
  }
}
