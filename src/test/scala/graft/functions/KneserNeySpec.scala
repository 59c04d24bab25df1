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

  test("trigram chain: statistics match hand counts and the chain is exactly normalized") {
    // corpus: "a b c", "a b d", "x b c" → trigrams (a,b,c), (a,b,d), (x,b,c)
    val d3 = Seq("a b c", "a b d", "x b c").toDF("text")
    val m = KneserNey.trigramModel(d3, "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r).toMap
    assert(m.keySet === Set(("a", "b", "c"), ("a", "b", "d"), ("x", "b", "c")))
    val abc = m(("a", "b", "c"))
    assert(abc.getLong(3) === 1L) // c123
    assert(abc.getLong(4) === 2L) // c12 = c(a b ·)
    assert(abc.getLong(5) === 2L) // n3f = |{c, d}|
    assert(abc.getLong(6) === 2L) // mnum = N1+(· b c) = |{a, x}|
    assert(abc.getLong(7) === 3L) // mden = N1+(· b ·) = |{(a,c),(a,d),(x,c)}|
    assert(abc.getLong(8) === 2L) // mf = |{c, d}| after b
    assert(abc.getLong(9) === 1L) // unum = N1+(· c) = |{b}|
    assert(abc.getLong(10) === 2L) // uden = |{(b,c),(b,d)}|
    val p1 = 1.0 / 2.0
    val p2 = (2.0 - 0.75) / 3.0 + ((0.75 * 2.0) / 3.0) * p1
    val p3 = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * p2
    assert(abc.getDouble(11) === p3)

    // exact normalization over the continuation vocab, per (w1, w2)
    val rich = Seq("a b c", "a b d", "x b c", "a b c d e", "b c a b", "c a b c")
      .toDF("text")
    val full = KneserNey.trigramModel(rich, "text")
    val vocab = full.select(col("w3"), col("unum")).distinct()
    val mids = full.select("w2", "w3", "mnum").distinct()
    val ctxs = full.select("w1", "w2", "c12", "n3f").distinct()
    val midCtx = full.select("w2", "mden", "mf").distinct()
    val tot = full.select("uden").distinct()
    val all = ctxs.join(midCtx, "w2").crossJoin(vocab).crossJoin(tot)
      .join(mids, Seq("w2", "w3"), "left")
      .join(full.select("w1", "w2", "w3", "c123"), Seq("w1", "w2", "w3"), "left")
      .withColumn("p", KneserNey.pkn3Expr(
        coalesce(col("c123"), lit(0L)), col("c12"), col("n3f"),
        coalesce(col("mnum"), lit(0L)), col("mden"), col("mf"),
        col("unum"), col("uden")))
    val sums = all.groupBy("w1", "w2").agg(sum("p").as("mass")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-12,
      s"(${r.getString(0)}, ${r.getString(1)}) mass ${r.getDouble(2)}"))
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
