package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** UnigramLm — vocabulary counts and per-document scoring, including
  * the ln-based avg_neg_logp the q60 oracle intentionally prunes
  * (libm last-ulp is engine-specific; the spec owns the double).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b"),
    (2L, "B c"), // case-folded: 'B' counts into 'b'
    (3L, "   ") // token-less: zero evidence, null score
  ).toDF("doc_id", "text")

  test("counts: lowercased whitespace vocabulary") {
    val vocab = UnigramLm.counts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
  }

  test("score: integer evidence and avg_neg_logp against hand computation") {
    val rows = UnigramLm.score(docs).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap

    // corpus: a:1 b:3 c:1, total 5 tokens
    val d1 = rows(1L) // tokens a, b, b
    assert(d1.getAs[Long]("n_toks") === 3L)
    assert(d1.getAs[Long]("sum_cnt") === 1L + 3L + 3L)
    assert(d1.getAs[Long]("min_cnt") === 1L)
    assert(d1.getAs[Long]("n_hapax") === 1L)
    val exp1 = math.log(5.0) - (math.log(1.0) + 2 * math.log(3.0)) / 3.0
    assert(math.abs(d1.getAs[Double]("avg_neg_logp") - exp1) < 1e-12)

    val d2 = rows(2L) // tokens b, c
    assert(d2.getAs[Long]("n_toks") === 2L)
    assert(d2.getAs[Long]("sum_cnt") === 3L + 1L)
    assert(d2.getAs[Long]("n_hapax") === 1L)
    val exp2 = math.log(5.0) - (math.log(3.0) + math.log(1.0)) / 2.0
    assert(math.abs(d2.getAs[Double]("avg_neg_logp") - exp2) < 1e-12)

    // token-less doc survives with zero evidence and a null score
    val d3 = rows(3L)
    assert(d3.getAs[Long]("n_toks") === 0L)
    assert(d3.getAs[Long]("sum_cnt") === 0L)
    assert(d3.getAs[Long]("min_cnt") === 0L)
    assert(d3.getAs[Long]("n_hapax") === 0L)
    assert(d3.isNullAt(d3.fieldIndex("avg_neg_logp")))
  }

  test("score orders: rare-token docs score higher (less typical)") {
    val corpus = Seq(
      (1L, "the the the the the"),
      (2L, "the the the zyzzyva qwfp")
    ).toDF("doc_id", "text")
    val byId = UnigramLm.score(corpus).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_neg_logp")).toMap
    assert(byId(2L) > byId(1L))
  }
}
