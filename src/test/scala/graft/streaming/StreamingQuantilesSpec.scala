package graft.streaming

import graft.SparkSpec
import graft.functions.QuantileSample
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** D22 — streaming quantiles: live estimates must equal the batch
  * bottom-k hash-sample sketch over every event seen so far (the
  * set-identity argument), replays must be no-ops, and state must
  * stay at k items however long the stream runs.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def jsonl(rows: Seq[(Long, String, Long, Double)]): String =
    rows.map { case (id, ts, u, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"view","value":$v}"""
    }.mkString("\n")

  test("streamed estimates equal the batch sketch; replays are no-ops; state bounded") {
    val dir = Files.createTempDirectory("graft_squant").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val k = 16
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[EventStreams.Event]
    val q = StreamingQuantiles.quantiles(src, k = k)
      .writeStream.format("memory").queryName("squant_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name), jsonl(rows))
      q.processAllAvailable()
    }
    def latest(): StreamingQuantiles.QuantUpdate =
      spark.table("squant_updates").as[StreamingQuantiles.QuantUpdate]
        .collect().maxBy(_.n_events)

    def mkRows(ids: Seq[Long]): Seq[(Long, String, Long, Double)] =
      ids.map(id => (id, "2024-01-01 00:00:01", 1L, ((id * 131) % 5000) / 100.0))

    val batch1 = mkRows(1L to 40L)
    val batch2 = mkRows(41L to 90L)
    drop("b1.jsonl", batch1)
    drop("b2.jsonl", batch2)
    val after2 = latest()

    def batchEst(rows: Seq[(Long, String, Long, Double)]): Map[Long, Long] = {
      val df = rows.map { case (id, _, _, v) => ("view", id, math.round(v * 100)) }
        .toDF("g", "id", "cents")
      QuantileSample.quantiles(df, "g", "id", col("cents"), k = k, ps = Seq(50, 90, 99))
        .select("p", "est").as[(Long, Long)].collect().toMap
    }
    val expected = batchEst(batch1 ++ batch2)
    assert(after2.p50 === expected(50L), "stream p50 must equal the batch sketch")
    assert(after2.p90 === expected(90L))
    assert(after2.p99 === expected(99L))
    assert(after2.m === k.toLong, "state holds exactly k items once the stream exceeds k")

    // replay a whole earlier batch: same ids → same triples → same set
    drop("b3.jsonl", batch1)
    val after3 = latest()
    q.stop()
    assert((after3.p50, after3.p90, after3.p99) === ((after2.p50, after2.p90, after2.p99)),
      "replayed events must not move any estimate")
    assert(after3.m === k.toLong)
  }
}
