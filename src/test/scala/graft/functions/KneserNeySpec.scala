package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b", "a b", "a c", "b c", "c a b"
  // bigrams: (a,b)x3 [two from "a b", one from "c a b"], (a,c)x1, (b,c)x1, (c,a)x1
  private val docs = Seq("a b", "a b", "a c", "b c", "c a b").toDF("text")

  test("model statistics match hand counts") {
    val m = KneserNey.model(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // bigram table: (a,b)=3, (a,c)=1, (b,c)=1, (c,a)=1 → B = 4
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")))
    val ab = m(("a", "b"))
    assert(ab.getLong(2) === 3L) // c12
    assert(ab.getLong(3) === 4L) // c1  = c(a·) = 3 + 1
    assert(ab.getLong(4) === 2L) // n1f = |{b, c}|
    assert(ab.getLong(5) === 1L) // n1b(b) = |{a}|
    assert(ab.getLong(6) === 4L) // B
    val expected = (3.0 - 0.75) / 4.0 + ((0.75 * 2.0) / 4.0) * (1.0 / 4.0)
    assert(ab.getDouble(7) === expected)
  }

  test("interpolated KN is exactly normalized: sum over the continuation vocab is 1") {
    val m = KneserNey.model(docs, "text")
    val vocab = m.select(col("w2"), col("n1b")).distinct()
    val contexts = m.select("w1", "c1", "n1f").distinct()
    val b = m.select("b_total").distinct()
    val all = contexts.crossJoin(vocab).crossJoin(b)
      .join(m.select("w1", "w2", "c12"), Seq("w1", "w2"), "left")
      .withColumn("p", KneserNey.pknExpr(coalesce(col("c12"), lit(0L)),
        col("c1"), col("n1f"), col("n1b"), col("b_total")))
    val sums = all.groupBy("w1").agg(sum("p").as("mass")).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12,
        s"context ${r.getString(0)} mass ${r.getDouble(1)}")
    }
  }

  test("continuation beats frequency: a frequent but context-locked word backs off low") {
    // "san francisco" repeated: francisco frequent, but only one left
    // context; "the" follows many contexts with the same total count.
    val d2 = (Seq.fill(6)("san francisco") ++
      Seq("in the", "on the", "at the", "by the", "of the", "for the")).toDF("text")
    val m = KneserNey.model(d2, "text")
      .select("w2", "n1b", "b_total").distinct().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n1bFran, b) = m("francisco")
    val (n1bThe, _) = m("the")
    assert(n1bFran === 1L && n1bThe === 6L,
      "continuation counts must track distinct contexts, not frequency")
    assert(n1bFran.toDouble / b < n1bThe.toDouble / b)
  }

  test("unseenExpr is the pure-backoff term and stays below any seen probability") {
    val m = KneserNey.model(docs, "text")
    val seen = m.filter(col("w1") === "a" && col("w2") === "b").head.getDouble(7)
    val unseenP = m.filter(col("w1") === "a").limit(1)
      .select(KneserNey.unseenExpr(col("c1"), col("n1f"), lit(1L), col("b_total")))
      .head.getDouble(0)
    assert(unseenP > 0.0 && unseenP < seen)
    assert(unseenP === ((0.75 * 2.0) / 4.0) * (1.0 / 4.0))
  }
}
