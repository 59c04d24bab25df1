package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("sketch surfaces true heavy hitters on skewed data") {
    HeavyHitters.register(spark)
    // 'hot' = 40% of rows, 'warm' = 20%, tail of 400 uniques
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"tail_$i")
    val df = rows.toDF("tok").repartition(8) // force partial buffers + merge
    val out = df.agg(HeavyHitters.heavyHitters($"tok", 10).as("hh"))
      .selectExpr("inline(hh)")
      .as[(String, Long)].collect()
    val items = out.map(_._1).toSeq
    assert(items.contains("hot") && items.contains("warm"))
    assert(out.length <= 10)
    // MG guarantee: reported min_count underestimates by at most n/(k+1)
    val hot = out.find(_._1 == "hot").get._2
    assert(hot >= 400 - 1000 / 11)
  }

  test("exactTopN returns the true top-N with certificates on skewed data") {
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(12)("mild") ++
      (1 to 40).map(i => s"tail_$i")
    val toks = rows.map(("en", _)).toDF("lang", "tok").repartition(4)
    val out = HeavyHitters.exactTopN(toks, "lang", "tok", k = 32, topN = 3)
      .as[(String, Long, String, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("en", 1L, "hot", 60L), ("en", 2L, "warm", 30L), ("en", 3L, "mild", 12L)))
  }

  test("exactTopN: fewer distinct items than topN is exact (complete sketch), no false alarm") {
    // 2 distinct tokens, k=32 → no evictions, n == S: the output is
    // the complete exact ranking and neither certificate fires.
    val toks = (Seq.fill(9)("only") ++ Seq.fill(4)("other")).map(("en", _)).toDF("lang", "tok")
    val out = HeavyHitters.exactTopN(toks, "lang", "tok", k = 32, topN = 3)
      .as[(String, Long, String, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("en", 1L, "only", 9L), ("en", 2L, "other", 4L)))
  }

  test("exactTopN: a sparse sketch (< topN candidates after evictions) fails loudly") {
    // k=3 over a flat 40-distinct stream forces heavy eviction; the
    // sketch cannot certify 3 ranks — the round-4 blind spot was that
    // the old rank-3 guard never evaluated when fewer than 3 candidate
    // rows survived. Certificate 1 must raise instead.
    val rows = (1 to 40).flatMap(i => Seq.fill(2)(s"t_$i")) // perfectly flat
    val toks = rows.map(("en", _)).toDF("lang", "tok").coalesce(1)
    val e = intercept[Exception] {
      HeavyHitters.exactTopN(toks, "lang", "tok", k = 3, topN = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("heavy-hitters")),
      s"expected a heavy-hitters certificate failure, got: ${msgs(e).mkString(" | ")}")
  }

  test("grouped sketches are independent per group") {
    HeavyHitters.register(spark)
    val df = (Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y"))).toDF("g", "tok")
    val out = df.groupBy("g").agg(HeavyHitters.heavyHitters($"tok", 4).as("hh"))
      .select($"g", expr("hh[0].item"), expr("hh[0].min_count"))
      .as[(String, String, Long)].collect().map { case (g, i, c) => g -> (i, c) }.toMap
    assert(out("a") == ("x", 50L))
    assert(out("b") == ("y", 50L))
  }
}
