package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** D36 — streaming k-anonymity gate: rare-QI rows quarantine, common
  * ones pass, the batch's own contribution counts toward k, stream ≡
  * batch kernel, per-batch exactly-once landing.
  */
class StreamingAnonymityGateSpec extends SparkSpec {
  import spark.implicits._

  // released corpus: 10 docs in the (en, web, bucket 0) group, ONE in
  // (fr, web, bucket 0) — the fr group is a 1-member re-id risk
  private lazy val released = (
    (0L until 10L).map(i => (i, "en", "web", "x" * 50)) :+
      ((10L, "fr", "web", "y" * 50))
    ).toDF("doc_id", "lang", "source", "text")

  test("rare QI combinations quarantine; batch contribution counts toward k") {
    val in = Files.createTempDirectory("graft_anin").toString
    val out = Files.createTempDirectory("graft_anout").toString
    val cp = Files.createTempDirectory("graft_ancp").toString
    val ref = StreamingAnonymityGate.reference(released)

    def jline(id: Long, lang: String, src: String, len: Int): String =
      s"""{"doc_id": $id, "lang": "$lang", "source": "$src", "text": "${"z" * len}"}"""
    // one en/web row (joins the size-10 group: passes), one fr/web row
    // (joins the size-1 group: 1+1 < 5, quarantines), FIVE de/web rows
    // (unseen group, but the batch itself clears k=5: passes)
    val lines = Seq(jline(100, "en", "web", 50), jline(101, "fr", "web", 50)) ++
      (102L until 107L).map(i => jline(i, "de", "web", 50))
    Files.write(Paths.get(in, "a.jsonl"), String.join("\n", lines: _*).getBytes)
    StreamingAnonymityGate.start(spark, in, ref, out, cp).awaitTermination(60000)

    val landed = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_n"), r.getAs[Boolean]("k_ok"))).toMap
    assert(landed.size === 7, "quarantine-not-drop: every row lands")
    assert(landed(100L) === ((11L, true)), "en joins the released group")
    assert(landed(101L) === ((2L, false)), "fr stays under k and quarantines")
    (102L until 107L).foreach(i =>
      assert(landed(i) === ((5L, true)), s"de row $i: the batch itself clears k"))

    // stream ≡ batch kernel
    val batchSide = StreamingAnonymityGate.gateBatch(
      Seq((100L, "en", "web", "z" * 50), (101L, "fr", "web", "z" * 50))
        .toDF("doc_id", "lang", "source", "text"), ref, 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("k_ok")).toMap
    assert(batchSide(100L) && !batchSide(101L))

    // retry idempotence + second drop appends only its partition
    val before = spark.read.parquet(out).count()
    StreamingAnonymityGate.ingestBatch(
      spark.read.schema("doc_id BIGINT, lang STRING, source STRING, text STRING")
        .json(in), 0L, ref, out, 5L)
    assert(spark.read.parquet(out).count() === before)
    Files.write(Paths.get(in, "b.jsonl"), jline(200, "en", "web", 50).getBytes)
    StreamingAnonymityGate.start(spark, in, ref, out, cp).awaitTermination(60000)
    val l2 = spark.read.parquet(out)
    assert(l2.filter($"batch_no" === 1L).count() === 1)
    assert(l2.filter($"batch_no" === 0L).count() === before)
  }
}
