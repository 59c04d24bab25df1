package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL sketch — exactness below capacity, ε·n rank-error bounds on
  * adversarial orders, merge bounds under arbitrary sharding, bounded
  * memory, and the Spark aggregate end-to-end.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val K = 200
  private val Eps = 0.03 // empirical bound pinned with margin (ε ~ O(1/k))

  private def rankOf(sorted: Array[Long], v: Long): Long = {
    // count of elements < v: the 0-based rank of v's first occurrence
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  private def checkBounds(xs: Seq[Long], buf: KllAgg.Buffer, what: String): Unit = {
    val sorted = xs.sorted.toArray
    val n = xs.size.toLong
    Seq(0, 100, 2500, 5000, 7500, 9900, 10000).foreach { p =>
      val target = (n - 1) * p / 10000
      val est = KllAgg.valueAtRank(buf, target)
      // est's true rank interval must be within eps*n of the target
      val lo = rankOf(sorted, est)
      val hi = rankOf(sorted, est + 1) - 1 // last occurrence
      val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(dist <= (Eps * n).ceil.toLong,
        s"$what p=$p: est $est covers ranks [$lo,$hi], target $target, err $dist > ${Eps * n}")
    }
  }

  test("below capacity the sketch is exact") {
    val xs = (1L to 150L).map(i => (i * 37) % 1000)
    val buf = KllAgg.emptyBuffer()
    xs.foreach(KllAgg.insert(buf, _, K))
    val sorted = xs.sorted
    Seq(0, 2500, 5000, 10000).foreach { p =>
      val target = ((xs.size - 1).toLong * p / 10000).toInt
      assert(KllAgg.valueAtRank(buf, target) === sorted(target), s"p=$p")
    }
  }

  test("rank error within eps*n on uniform, sorted, reversed and duplicate-heavy inputs") {
    val n = 100000
    val cases = Map(
      "uniform" -> (0 until n).map(i => (i.toLong * 48271) % 1000003),
      "sorted" -> (0 until n).map(_.toLong),
      "reversed" -> (0 until n).map(i => (n - i).toLong),
      "dup-heavy" -> (0 until n).map(i => (i % 7).toLong))
    cases.foreach { case (name, xs) =>
      val buf = KllAgg.emptyBuffer()
      xs.foreach(KllAgg.insert(buf, _, K))
      assert(buf.n === n.toLong)
      checkBounds(xs, buf, name)
    }
  }

  test("merged shards obey the same bound whatever the sharding") {
    val n = 60000
    val xs = (0 until n).map(i => (i.toLong * 69621) % 99991)
    Seq(2, 7, 64).foreach { shards =>
      val bufs = (0 until shards).map(_ => KllAgg.emptyBuffer())
      xs.zipWithIndex.foreach { case (v, i) => KllAgg.insert(bufs(i % shards), v, K) }
      val merged = bufs.reduce { (a, b) => KllAgg.mergeInto(a, b, K); a }
      assert(merged.n === n.toLong)
      checkBounds(xs, merged, s"shards=$shards")
    }
  }

  test("memory stays O(k log n): retained items bounded at n = 100k") {
    val buf = KllAgg.emptyBuffer()
    (0 until 100000).foreach(i => KllAgg.insert(buf, (i.toLong * 48271) % 1000003, K))
    val retained = buf.levels.map(_.size).sum
    assert(retained <= 4 * K,
      s"retained $retained items for k=$K — the geometric schedule failed")
    assert(buf.levels.length <= 16)
  }

  test("Spark aggregate end-to-end: per-group bounds through the map-side-combine path") {
    Kll.register(spark)
    val rows = (0 until 40000).map(i => (s"g${i % 2}", (i.toLong * 48271) % 65521))
    val df = rows.toDF("g", "v").repartition(16)
    val out = df.groupBy("g")
      .agg(Kll.kllQuantiles(col("v"), Seq(0, 5000, 10000), K).as("s"))
      .select(col("g"), col("s.n").as("n"), col("s.qs").as("qs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    Seq("g0", "g1").foreach { g =>
      val xs = rows.filter(_._1 == g).map(_._2)
      val (n, qs) = out(g)
      assert(n === xs.size.toLong)
      val sorted = xs.sorted.toArray
      Seq(0, 5000, 10000).zip(qs).foreach { case (p, est) =>
        val target = (n - 1) * p / 10000
        val lo = rankOf(sorted, est)
        val hi = rankOf(sorted, est + 1) - 1
        val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
        assert(dist <= (Eps * n).ceil.toLong, s"group $g p=$p err $dist")
      }
    }
  }
}
