package graft.functions

import graft.SparkSpec

/** BigramLm — corpus pair counts, per-document conditional scoring
  * (including the ln-based avg_neg_logp the q95 oracle prunes), the
  * word-salad ordering unigram scoring is blind to, and partition
  * invariance.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b"),
    (2L, "B a"), // case-folded: 'B' counts into 'b'
    (3L, "solo"), // one token: no bigrams, null score
    (4L, "   ") // token-less
  ).toDF("doc_id", "text")

  test("counts: lowercased adjacent-pair vocabulary") {
    val bg = BigramLm.counts(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1: (a,b) (b,a) (a,b); doc2: (b,a)
    assert(bg === Map(("a", "b") -> 2L, ("b", "a") -> 2L))
  }

  test("score: integer evidence and avg_neg_logp against hand computation") {
    val rows = BigramLm.score(docs).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap

    // corpus: c(a,b)=2 c(b,a)=2; contexts: c(a·)=2 c(b·)=2
    val d1 = rows(1L) // pairs (a,b)×2, (b,a)×1
    assert(d1.getAs[Long]("n_bigrams") === 3L)
    assert(d1.getAs[Long]("sum_cnt") === 2L * 2L + 1L * 2L)
    assert(d1.getAs[Long]("min_cnt") === 2L)
    assert(d1.getAs[Long]("n_hapax") === 0L)
    assert(d1.getAs[Long]("sum_ctx") === 2L * 2L + 1L * 2L)
    // every pair: -ln(2/2) = 0
    assert(math.abs(d1.getAs[Double]("avg_neg_logp")) < 1e-12)

    val d2 = rows(2L) // pair (b,a)
    assert(d2.getAs[Long]("n_bigrams") === 1L)
    assert(d2.getAs[Long]("sum_cnt") === 2L)
    assert(d2.getAs[Long]("sum_ctx") === 2L)

    // < 2 tokens: zero evidence, null score
    for (id <- Seq(3L, 4L)) {
      val d = rows(id)
      assert(d.getAs[Long]("n_bigrams") === 0L)
      assert(d.getAs[Long]("sum_cnt") === 0L)
      assert(d.getAs[Long]("min_cnt") === 0L)
      assert(d.getAs[Long]("n_hapax") === 0L)
      assert(d.getAs[Long]("sum_ctx") === 0L)
      assert(d.isNullAt(d.fieldIndex("avg_neg_logp")))
    }
  }

  test("word salad scores worse than typical text at equal unigram mix") {
    // both docs use the same tokens with the same frequencies; only
    // ADJACENCY differs — the corpus's dominant order is "the cat sat"
    val corpus = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "the cat sat the cat sat the cat sat"),
      (3L, "sat the cat cat sat the the cat sat")
    ).toDF("doc_id", "text")
    val byId = BigramLm.score(corpus).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_neg_logp")).toMap
    assert(byId(3L) > byId(1L))
    // unigram scoring cannot separate them (identical token counts)
    val uni = UnigramLm.score(corpus).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_neg_logp")).toMap
    assert(math.abs(uni(3L) - uni(1L)) < 1e-12)
  }

  test("hapax bigrams: corpus-unique pairs are flagged") {
    val corpus = Seq(
      (1L, "x y x y"),
      (2L, "y z")
    ).toDF("doc_id", "text")
    val rows = BigramLm.score(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    // corpus: c(x,y)=2, c(y,x)=1, c(y,z)=1
    assert(rows(1L).getAs[Long]("n_hapax") === 1L) // the (y,x) occurrence
    assert(rows(2L).getAs[Long]("n_hapax") === 1L) // the (y,z) occurrence
    assert(rows(2L).getAs[Long]("min_cnt") === 1L)
  }

  test("partition invariance") {
    val base = BigramLm.score(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val re = BigramLm.score(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(re === base)
  }
}
