package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bottom-k hash-sample quantile sketch: the sample is the brute
  * bottom-k by md5, small groups become exact, the set semantics make
  * it partition-invariant (the property KLL/t-digest lack), and the
  * rank-error certificate is computed correctly.
  */
class QuantileSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def h60(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).take(15), 16)

  test("the sample is exactly the brute bottom-k by the md5 hash") {
    val df = (1L to 500L).map(id => ("g", id, id * 7 % 1000)).toDF("g", "id", "v")
    val got = QuantileSample.sample(df, "g", "id", col("v"), k = 32)
      .select("id").as[Long].collect().toSet
    val expected = (1L to 500L).sortBy(id => (h60(id), id)).take(32).toSet
    assert(got === expected)
  }

  test("small groups sample themselves entirely — estimates are exact") {
    val vals = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 10L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "id", "v")
    val q = QuantileSample.quantiles(df, "g", "id", col("v"), k = 256, ps = Seq(0, 50, 100))
      .select("p", "est").as[(Long, Long)].collect().toMap
    // m=10: p0 → rank 0 → 1; p50 → rank ⌊450/100⌋=4 → value 5; p100 → rank 9 → 10
    assert(q(0L) === 1L)
    assert(q(50L) === 5L)
    assert(q(100L) === 10L)
  }

  test("partition invariance: the sketch is a set, not a compaction history") {
    val df = (1L to 2000L).map(id => (s"g${id % 3}", id, (id * 131) % 10000)).toDF("g", "id", "v")
    def run(parts: Int) =
      QuantileSample.quantiles(df.repartition(parts), "g", "id", col("v"),
        k = 64, ps = Seq(50, 90, 99))
        .select("g", "p", "est", "m").as[(String, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) === run(37))
  }

  test("certificate: exact ranks are correct and uniform data sits within the bound") {
    val n = 5000
    val df = (1L to n.toLong).map(id => ("g", id, (id * 7919) % 100000)).toDF("g", "id", "v")
    val ests = QuantileSample.quantiles(df, "g", "id", col("v"), k = 256, ps = Seq(50, 90, 99))
    val out = QuantileSample.withCertificate(df, "g", "id", col("v"), 256, ests)
      .select("p", "est", "n", "exact_rank", "within_bound")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.length === 3)
    val values = (1L to n.toLong).map(id => (id * 7919) % 100000)
    for ((p, est, nTot, rank, ok) <- out) {
      assert(nTot === n.toLong)
      assert(rank === values.count(_ < est).toLong, s"p$p exact rank")
      assert(ok, s"p$p estimate rank $rank vs target ${p * (n - 1) / 100} outside 3n/sqrt(k)")
    }
  }
}
