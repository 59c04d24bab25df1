package graft.streaming

import graft.SparkSpec
import graft.functions.{HllAgg, HyperLogLog}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** D19 — persisted sketch blobs: two streaming SESSIONS (cold
  * restart between: new query, new checkpoint, new source dir) write
  * per-batch HLL register blobs into one store; merging the blobs
  * months-later-style must be register-IDENTICAL to a single batch
  * sketch of every value either session saw, and the estimate must
  * equal the batch hll aggregate's to the last digit.
  */
class StreamingSketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private val P = 10

  private def jsonl(rows: Seq[(String, String)]): String =
    rows.map { case (k, v) => s"""{"key":"$k","value":"$v"}""" }.mkString("\n")

  private def runSession(base: String, tag: String, drops: Seq[Seq[(String, String)]],
                         blobDir: String): Unit = {
    val in = s"$base/in_$tag"
    Files.createDirectories(Paths.get(in))
    val src = spark.readStream
      .schema("key STRING, value STRING")
      .json(in)
      .as[StreamingSketchStore.KeyedValue]
    val q = StreamingSketchStore.start(src, blobDir, s"$base/ckpt_$tag", p = P)
    try {
      drops.zipWithIndex.foreach { case (rows, i) =>
        Files.writeString(Paths.get(in, s"d$i.jsonl"), jsonl(rows))
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("blobs from two sessions union to the exact batch sketch (cold restart between)") {
    val base = Files.createTempDirectory("graft_sketchstore").toString
    val blobs = s"$base/blobs"

    val s1b1 = (0 until 300).map(i => ("en", s"tok${i % 120}")) ++
      (0 until 40).map(i => ("de", s"wort$i"))
    val s1b2 = (0 until 200).map(i => ("en", s"tok${80 + i % 120}")) // overlaps 80-119
    // ---- session 1: two micro-batches ----
    runSession(base, "s1", Seq(s1b1, s1b2), blobs)

    // ---- cold restart: session 2, fresh checkpoint + source ----
    val s2b1 = (0 until 150).map(i => ("en", s"tok${150 + i % 100}")) ++ // overlaps 150-199
      (0 until 10).map(i => ("fr", s"mot$i")) ++
      Seq(("de", "wort0"), ("de", "wort1")) // pure replays — must be no-ops
    runSession(base, "s2", Seq(s2b1), blobs)

    val all = s1b1 ++ s1b2 ++ s2b1
    val merged = StreamingSketchStore.readMerged(spark, blobs, p = P)
      .collect().map(m => m.key -> m).toMap

    // every key saw one blob per micro-batch it appeared in
    assert(merged("en").n_blobs == 3L)
    assert(merged("de").n_blobs == 2L)
    assert(merged("fr").n_blobs == 1L)

    // register identity: union-of-blobs == one sketch of all values
    val byKey = all.groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      val want = new Array[Byte](1 << P)
      rows.foreach { case (_, v) => HllAgg.add(want, v, P) }
      assert(java.util.Arrays.equals(merged(k).registers, want),
        s"$k: merged blob registers differ from the batch sketch")
    }

    // estimate identity vs the batch AGGREGATE over the union
    HyperLogLog.register(spark)
    val batchEst = all.toDF("key", "value").groupBy("key")
      .agg(HyperLogLog.hllDistinct(col("value"), P).as("est"))
      .as[(String, Long)].collect().toMap
    byKey.keys.foreach { k =>
      assert(merged(k).estimate == batchEst(k),
        s"$k: merged estimate ${merged(k).estimate} != batch ${batchEst(k)}")
    }

    // sanity: estimates are near the true distinct counts
    val truth = byKey.view.mapValues(_.map(_._2).distinct.size).toMap
    byKey.keys.foreach { k =>
      val err = math.abs(merged(k).estimate - truth(k)).toDouble / truth(k)
      assert(err < 0.15, s"$k: estimate ${merged(k).estimate} vs true ${truth(k)}")
    }
  }

  test("KLL arm: merged blobs answer quantiles within eps*n across sessions") {
    val base = Files.createTempDirectory("graft_kllstore").toString
    val blobs = s"$base/kll_blobs"
    def jsonlL(rows: Seq[(String, Long)]): String =
      rows.map { case (k, v) => s"""{"key":"$k","value":$v}""" }.mkString("\n")
    def session(tag: String, drops: Seq[Seq[(String, Long)]]): Unit = {
      val in = s"$base/in_$tag"
      Files.createDirectories(Paths.get(in))
      val src = spark.readStream
        .schema("key STRING, value BIGINT")
        .json(in)
        .as[StreamingSketchStore.KeyedLong]
      val q = StreamingSketchStore.startKll(src, blobs, s"$base/ckpt_$tag", k = 200)
      try drops.zipWithIndex.foreach { case (rows, i) =>
        Files.writeString(Paths.get(in, s"d$i.jsonl"), jsonlL(rows))
        q.processAllAvailable()
      } finally q.stop()
    }
    val b1 = (0 until 8000).map(i => ("len", (i.toLong * 48271) % 100003))
    val b2 = (0 until 6000).map(i => ("len", (i.toLong * 69621) % 100003)) ++
      (0 until 500).map(i => ("score", i.toLong))
    val b3 = (0 until 5000).map(i => ("len", i.toLong)) // sorted batch, cold restart
    session("k1", Seq(b1, b2))
    session("k2", Seq(b3))

    val ps = Seq(100, 5000, 9900)
    val merged = StreamingSketchStore.readMergedKll(spark, blobs, ps, k = 200)
      .collect().map(m => m.key -> m).toMap
    assert(merged("len").n_blobs === 3L && merged("score").n_blobs === 1L)
    val byKey = (b1 ++ b2 ++ b3).groupBy(_._1)
    byKey.foreach { case (key, rows) =>
      val xs = rows.map(_._2).sorted.toArray
      val m = merged(key)
      assert(m.n === xs.length.toLong, s"$key: weight not conserved")
      ps.zip(m.qs).foreach { case (p, est) =>
        val target = (m.n - 1) * p / 10000
        var lo = 0; var hi = xs.length
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (xs(mid) < est) lo = mid + 1 else hi = mid }
        val first = lo.toLong
        var lo2 = 0; var hi2 = xs.length
        while (lo2 < hi2) { val mid = (lo2 + hi2) >>> 1; if (xs(mid) <= est) lo2 = mid + 1 else hi2 = mid }
        val last = lo2.toLong - 1
        val dist = if (target < first) first - target
          else if (target > last) target - last else 0L
        assert(dist <= (0.03 * m.n).ceil.toLong, s"$key p=$p err $dist")
      }
    }
  }
}
