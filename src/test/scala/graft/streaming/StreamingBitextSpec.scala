package graft.streaming

import graft.SparkSpec
import graft.similarity.IvfIndex
import java.nio.file.{Files, Paths}

/** D37 — streaming bitext mining: planted translation twins arriving
  * in drops mine selected = true against the standing source index,
  * dense-cluster arrivals margin-reject, stream ≡ batch kernel, and
  * per-batch landing is retry-idempotent.
  */
class StreamingBitextSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private def anchor(i: Int): Array[Float] =
    Array.tabulate(Dim)(d => (((i * 7 + d * 13) % 19) - 9) / 10.0f +
      (if (d == (i * 5) % Dim) 3.0f else 0f))

  // standing SOURCE side: en docs 0..3 at anchors, 10..15 a dense
  // cluster at anchor(40) (so arriving cluster members have a uniform
  // source pool to be margin-rejected against)
  private lazy val srcDocs = (
    (0 to 3).map(i => (i.toLong, anchor(i).toSeq)) ++
      (10 to 15).map(i => (i.toLong,
        anchor(40).zipWithIndex.map { case (x, d) => x + (if (d == i) 0.03f else 0f) }.toSeq))
    ).toDF("doc_id", "embedding")

  private lazy val model =
    IvfIndex.trainCentroidsQuantized(srcDocs, Dim, nCentroids = 2,
      idCol = "doc_id", vecCol = "embedding")

  private def jline(id: Long, v: Seq[Float]): String =
    s"""{"doc_id": $id, "embedding": [${v.mkString(", ")}]}"""

  test("twins arriving in drops mine selected; cluster arrivals margin-reject; stream == batch") {
    val in = Files.createTempDirectory("graft_btin").toString
    val out = Files.createTempDirectory("graft_btout").toString
    val cp = Files.createTempDirectory("graft_btcp").toString
    val index = StreamingBitext.buildIndex(srcDocs, model)

    // drop 1: twins of en 0..1; drop 2: a twin of en 2 plus FOUR
    // arrivals inside the dense cluster (their best source is
    // absolutely close but no closer than the cluster — reject)
    val twin = (i: Int) => anchor(i).zipWithIndex
      .map { case (x, d) => x + (if (d == i) 0.02f else 0f) }.toSeq
    val clusterArrival = (j: Int) => anchor(40).zipWithIndex
      .map { case (x, d) => x + (if (d == 20 + j) 0.03f else 0f) }.toSeq
    Files.write(Paths.get(in, "a.jsonl"),
      Seq(jline(100, twin(0)), jline(101, twin(1))).mkString("\n").getBytes)
    StreamingBitext.start(spark, in, index, model, out, cp).awaitTermination(60000)
    Files.write(Paths.get(in, "b.jsonl"),
      (Seq(jline(102, twin(2))) ++ (0 to 3).map(j => jline(200L + j, clusterArrival(j))))
        .mkString("\n").getBytes)
    StreamingBitext.start(spark, in, index, model, out, cp).awaitTermination(60000)

    val landed = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("tgt_id") ->
        ((r.getAs[Long]("src_id"), r.getAs[Boolean]("selected")))).toMap
    (0 to 2).foreach { i =>
      val (src, sel) = landed(100L + i)
      assert(src === i.toLong, s"twin ${100 + i} must match source $i, got $src")
      assert(sel, s"twin ${100 + i} must clear the margin")
    }
    (0 to 3).foreach { j =>
      landed.get(200L + j).foreach { case (_, sel) =>
        assert(!sel, s"cluster arrival ${200 + j} must fail the margin")
      }
    }

    // stream ≡ batch kernel on the second drop's rows
    val batch2 = spark.read
      .schema("doc_id BIGINT, embedding ARRAY<FLOAT>")
      .json(in).filter($"doc_id" >= 102L)
    val batchSide = StreamingBitext.verdicts(batch2, index, model)
      .collect().map(r => r.getAs[Long]("tgt_id") ->
        ((r.getAs[Long]("src_id"), r.getAs[Long]("dist"), r.getAs[Boolean]("selected")))).toMap
    val streamed = spark.read.parquet(out).filter($"batch_no" === 1L).collect()
      .map(r => r.getAs[Long]("tgt_id") ->
        ((r.getAs[Long]("src_id"), r.getAs[Long]("dist"), r.getAs[Boolean]("selected")))).toMap
    assert(streamed === batchSide, "stream must equal the batch kernel on the same rows")

    // retry idempotence: replaying batch 0 rewrites only its partition
    val before = spark.read.parquet(out).count()
    StreamingBitext.mineBatch(
      spark.read.schema("doc_id BIGINT, embedding ARRAY<FLOAT>").json(in)
        .filter($"doc_id" < 102L), 0L, index, model, out, 4, 3, 105)
    assert(spark.read.parquet(out).count() === before)
  }
}
