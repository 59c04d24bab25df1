package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: exact prefix offsets in md5 order, boundary
  * flags, the zero-token edge, and partitioning invariance.
  */
class PackingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("offsets and sequence ids match a reference packing") {
    import spark.implicits._
    val docs = Seq((1L, 4L), (2L, 0L), (3L, 7L), (4L, 10L), (5L, 3L), (6L, 25L))
    val out = Packing.packSequences(docs.toDF("doc_id", "n"), "doc_id", "n",
        seqLen = 10L, writers = 1)
      .select("doc_id", "n", "cum_before", "start_seq", "end_seq", "crosses_boundary")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

    // reference: same md5 order, plain Scala fold
    var cum = 0L
    val expected = docs.sortBy { case (id, _) => (md5hex(id.toString), id) }.map { case (id, n) =>
      val before = cum
      cum += n
      val start = before / 10L
      val end = math.max(before, before + n - 1) / 10L
      id -> ((before, start, end, end > start))
    }.toMap
    assert(out == expected)
    // the zero-token doc must sit at its offset without crossing
    val (_, zs, ze, zc) = out(2L)
    assert(zs == ze && !zc)
  }

  test("packing is partitioning-invariant and writer-local") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, i % 17)).toDF("doc_id", "n")
    def run(parts: Int) = Packing.packSequences(docs.repartition(parts), "doc_id", "n",
        seqLen = 64L, writers = 4)
      .select("doc_id", "writer", "cum_before").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val one = run(1)
    assert(one == run(8))
    // per-writer totals: the largest (cum_before + n) equals the
    // writer's token mass — offsets are contiguous, nothing dropped
    val byWriter = Packing.packSequences(docs, "doc_id", "n", 64L, 4)
      .groupBy("writer").agg(max(col("cum_before") + col("n")).as("stream_len"),
        sum(col("n")).as("mass"))
      .collect()
    byWriter.foreach(r => assert(r.getLong(1) == r.getLong(2), s"writer ${r.getLong(0)}"))
  }
}
