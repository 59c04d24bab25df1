package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Bm25 — scores match the closed-form formula computed independently
  * in Scala, ranking/tiebreak/k semantics, and the length-
  * normalization direction (same tf, shorter doc wins).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // d1 "a a b" (dl 3), d2 "a c" (dl 2), d3 "b b b b" (dl 4)
  private lazy val docs = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b b b b")).toDF("doc_id", "text")

  private def run(queries: Seq[(Long, String)], k: Int = 10): Seq[(Long, Long, Long, Long, Double)] =
    Bm25.topK(docs, queries.toDF("query_id", "term"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
      .sortBy(t => (t._1, t._2))

  /** The documented formula, same double operation order. */
  private def expected(tf: Long, dl: Long, df: Long, n: Long, tot: Long): Double = {
    val nd = n.toDouble
    val idf = (nd - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val tfn = (tf.toDouble * (1.2 + 1.0)) /
      (tf.toDouble + 1.2 * ((1.0 - 0.75) + (0.75 * dl.toDouble) / (tot.toDouble / nd)))
    idf * tfn
  }

  test("single-term query: scores equal the closed form, higher tf ranks first") {
    val out = run(Seq(1L -> "a"))
    assert(out.map(t => (t._2, t._3, t._4)) === Seq((1L, 1L, 1L), (2L, 2L, 1L)),
      "d1 (tf 2) above d2 (tf 1); d3 absent")
    assert(out(0)._5 === expected(tf = 2, dl = 3, df = 2, n = 3, tot = 9))
    assert(out(1)._5 === expected(tf = 1, dl = 2, df = 2, n = 3, tot = 9))
  }

  test("multi-term query: per-doc score is the sum over matched terms") {
    val out = run(Seq(2L -> "a", 2L -> "b"))
    val byDoc = out.map(t => t._3 -> ((t._4, t._5))).toMap
    assert(byDoc(1L)._1 === 2L, "d1 matches both terms")
    assert(byDoc(1L)._2 ===
      expected(2, 3, 2, 3, 9) + expected(1, 3, 2, 3, 9),
      "sum folds a-then-b (token order)")
    assert(byDoc(3L) === ((1L, expected(4, 4, 2, 3, 9))))
  }

  test("length normalization: same tf, shorter document scores higher") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val out = Bm25.topK(d, Seq(1L -> "a").toDF("query_id", "term"), 10)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(out(2L) === 1L && out(1L) === 2L)
  }

  test("ties break on ascending doc id; k bounds each query independently") {
    val d = Seq((7L, "a b"), (3L, "a b"), (9L, "a b")).toDF("doc_id", "text")
    val q = Seq(1L -> "a", 2L -> "b")
    val all = Bm25.topK(d, q.toDF("query_id", "term"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.toSet === Set((1L, 1L, 3L), (1L, 2L, 7L), (1L, 3L, 9L),
      (2L, 1L, 3L), (2L, 2L, 7L), (2L, 3L, 9L)))
    val top1 = Bm25.topK(d, q.toDF("query_id", "term"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(top1.toSet === Set((1L, 3L), (2L, 3L)))
  }
}
