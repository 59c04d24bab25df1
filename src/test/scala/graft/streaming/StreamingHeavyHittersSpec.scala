package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** D13 — streaming Misra-Gries heavy hitters: the MG invariants
  * (undercount-only, bounded miss, frequent-item superset) must hold
  * after every micro-batch, over multi-drop streams and the corpus.
  * Candidate BUFFERS are order-dependent between the bounds (standard
  * MG) so the assertions target the invariants, never buffer equality.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def latest(table: String): Map[String, StreamingHeavyHitters.HhUpdate] =
    spark.table(table).as[StreamingHeavyHitters.HhUpdate]
      .collect().groupBy(_.key)
      .map { case (kk, rows) => kk -> rows.maxBy(_.n_items) }

  private def checkInvariants(u: StreamingHeavyHitters.HhUpdate,
                              exact: Map[String, Long], k: Int): Unit = {
    assert(u.n_items === exact.values.sum, s"${u.key}: n mismatch")
    assert(u.candidates.size <= k)
    assert(u.retained === u.candidates.map(_.min_count).sum)
    u.candidates.foreach { c =>
      assert(c.min_count <= exact(c.item),
        s"${u.key}/${c.item}: sketch ${c.min_count} overcounts exact ${exact(c.item)}")
      assert(exact(c.item) - c.min_count <= u.bound,
        s"${u.key}/${c.item}: undercount exceeds the (n-S)/(k+1) bound")
    }
    val cand = u.candidates.map(_.item).toSet
    exact.foreach { case (item, cnt) =>
      if (cnt > u.bound)
        assert(cand.contains(item),
          s"${u.key}/$item: true count $cnt > bound ${u.bound} but absent from candidates")
    }
  }

  test("MG invariants hold after every micro-batch across drops") {
    val dir = Files.createTempDirectory("graft_hh").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
    val src = spark.readStream
      .schema("key STRING, item STRING")
      .option("pathGlobFilter", "*.jsonl")
      .json(s"$dir/in")
      .as[(String, String)]
    val k = 3
    val q = StreamingHeavyHitters.sketch(src, k)
      .writeStream.format("memory").queryName("hh_updates")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def drop(name: String, items: Seq[(String, String)]): Unit = {
      Files.writeString(java.nio.file.Paths.get(dir, "in", name),
        items.map { case (kk, i) => s"""{"key":"$kk","item":"$i"}""" }.mkString("\n"))
      q.processAllAvailable()
    }

    // drop 1: a dominates en; de has a small distinct set
    val d1 = Seq.fill(6)(("en", "a")) ++ Seq(("en", "b"), ("en", "c"), ("en", "d")) ++
      Seq(("de", "x"), ("de", "x"), ("de", "y"))
    drop("b1.jsonl", d1)
    val exact1 = d1.groupBy(identity).map { case ((kk, i), v) => (kk, i) -> v.size.toLong }
    val after1 = latest("hh_updates")
    checkInvariants(after1("en"), exact1.collect { case ((kk, i), c) if kk == "en" => i -> c }, k)
    checkInvariants(after1("de"), exact1.collect { case ((kk, i), c) if kk == "de" => i -> c }, k)
    assert(after1("en").candidates.map(_.item).contains("a"),
      "the dominant item must survive drop 1")

    // drop 2: b surges past a — the carried state must absorb it
    val d2 = Seq.fill(12)(("en", "b")) ++ Seq(("en", "e"), ("en", "f"))
    drop("b2.jsonl", d2)
    val all = d1 ++ d2
    val exact2 = all.filter(_._1 == "en").groupBy(_._2).map { case (i, v) => i -> v.size.toLong }
    val after2 = latest("hh_updates")
    checkInvariants(after2("en"), exact2, k)
    assert(after2("en").candidates.map(_.item).contains("b"),
      "an item surging across micro-batches must enter the candidates")
    assert(after2("en").n_items === all.count(_._1 == "en").toLong)
    q.stop()
  }

  test("corpus stream: every frequent token per lang survives; exact top-3 certified in") {
    val dir = Files.createTempDirectory("graft_hh_c").toString
    val docs = Tables.documents(spark, sf())
    docs.write.mode("overwrite").parquet(s"$dir/in_parquet")
    val k = 64
    val src = spark.readStream.schema(docs.schema).parquet(s"$dir/in_parquet")
      .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("item"))
      .as[(String, String)]
    val q = StreamingHeavyHitters.sketch(src, k)
      .writeStream.format("memory").queryName("hh_corpus")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(120000)

    val exact = docs
      .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("item"))
      .groupBy("lang", "item").agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }

    val streamed = latest("hh_corpus")
    assert(streamed.keySet === exact.keySet)
    exact.foreach { case (lang, counts) =>
      checkInvariants(streamed(lang), counts, k)
      // the exact top-3 tokens clear the miss bound at k=64 on this
      // corpus, so the two-phase exact ranking (q34's shape) is
      // certified to find them inside the streamed candidate set
      val top3 = counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(3)
      val cand = streamed(lang).candidates.map(_.item).toSet
      top3.foreach { case (item, cnt) =>
        assert(cnt > streamed(lang).bound,
          s"$lang/$item: corpus top-3 count $cnt does not clear bound ${streamed(lang).bound} at k=$k")
        assert(cand.contains(item), s"$lang/$item: top-3 token missing from candidates")
      }
    }
  }
}
