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
    // (unseen group, but the batch itself clears k=5: passes), plus a
    // POISON line: not JSON at all — it must land parse-quarantined,
    // not as a (null, null) QI group (r15 ADVICE)
    val lines = Seq(jline(100, "en", "web", 50), jline(101, "fr", "web", 50)) ++
      (102L until 107L).map(i => jline(i, "de", "web", 50)) :+
      "this line is not json {{{"
    Files.write(Paths.get(in, "a.jsonl"), String.join("\n", lines: _*).getBytes)
    StreamingAnonymityGate.start(spark, in, ref, out, cp).awaitTermination(60000)

    val all = spark.read.parquet(out).collect()
    assert(all.length === 8, "quarantine-not-drop: every line lands, poison included")
    val poison = all.filter(!_.getAs[Boolean]("parse_ok"))
    assert(poison.length === 1 && !poison(0).getAs[Boolean]("k_ok") &&
      poison(0).getAs[String]("raw") === "this line is not json {{{",
      "the poison line lands parse-quarantined with its raw bytes")
    val landed = all.filter(_.getAs[Boolean]("parse_ok"))
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_n"), r.getAs[Boolean]("k_ok"))).toMap
    assert(landed.size === 7, "all seven parsed rows land")
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

    // retry idempotence + second drop appends only its partition (the
    // retry replays the stream's own line-shaped batch)
    val before = spark.read.parquet(out).count()
    StreamingAnonymityGate.ingestBatch(
      graft.sources.Jsonl.parse(
        spark.read.text(in).select($"value".as("line")), "line",
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, lang STRING, source STRING, text STRING")),
      0L, ref, out, 5L)
    assert(spark.read.parquet(out).count() === before)
    Files.write(Paths.get(in, "b.jsonl"), jline(200, "en", "web", 50).getBytes)
    StreamingAnonymityGate.start(spark, in, ref, out, cp).awaitTermination(60000)
    val l2 = spark.read.parquet(out)
    assert(l2.filter($"batch_no" === 1L).count() === 1)
    assert(l2.filter($"batch_no" === 0L).count() === before)
  }

  test("readSink unions mixed v1/v2 sink schemas (r15 bump: parse_ok/raw)") {
    val out = Files.createTempDirectory("graft_anmix").toString
    val ref = StreamingAnonymityGate.reference(released)
    // a v1-era partition: the pre-r15 sink schema, no parse_ok/raw
    Seq((1L, "en", "web", 0L, 11L, true))
      .toDF("doc_id", "lang", "source", "len_bucket", "group_n", "k_ok")
      .withColumn("batch_no", org.apache.spark.sql.functions.lit(0L))
      .write.partitionBy("batch_no").mode("append").parquet(out)
    // a v2 partition written by today's gate
    StreamingAnonymityGate.ingestBatch(
      Seq((2L, "en", "web", "z" * 50)).toDF("doc_id", "lang", "source", "text"),
      1L, ref, out, 5L)
    val merged = StreamingAnonymityGate.readSink(spark, out)
    assert(Set("parse_ok", "raw").subsetOf(merged.columns.toSet),
      "the v2 columns survive a read that also sees v1 footers")
    val rows = merged.collect().map(r =>
      r.getAs[Long]("doc_id") ->
        ((Option(r.get(r.fieldIndex("parse_ok"))), r.getAs[Boolean]("k_ok")))).toMap
    assert(rows(1L) === ((None, true)), "v1 rows surface parse_ok as NULL (unknown)")
    assert(rows(2L) === ((Some(true), true)), "v2 rows keep their parse verdict")
  }
}
