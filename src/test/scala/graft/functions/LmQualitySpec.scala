package graft.functions

import graft.SparkSpec

/** LmQuality: hand-derived KN scores on a four-bigram corpus, the
  * unseen-bigram and OOV-context arms under cross-corpus scoring,
  * document-order fold determinism under repartitioning, and the
  * bucket thresholds.
  */
class LmQualitySpec extends SparkSpec {
  import spark.implicits._

  // model: (a,b):3  (b,a):1  (b,c):1  (c,q):1   B = 4
  // c1(a)=3 n1f(a)=1 | c1(b)=2 n1f(b)=2 | c1(c)=1 n1f(c)=1
  // n1b: b=1 a=1 c=1 q=1
  private val corpus = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "x"), // one token — no pairs, absent from output
    (4L, "c q")
  ).toDF("doc_id", "text")

  private val pAB = (3.0 - 0.75) / 3.0 + ((0.75 * 1.0) / 3.0) * (1.0 / 4.0) // 0.8125
  private val pBA = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * (1.0 / 4.0) // 0.3125
  private val pBC = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * (1.0 / 4.0) // 0.3125
  private val pCQ = (1.0 - 0.75) / 1.0 + ((0.75 * 1.0) / 1.0) * (1.0 / 4.0) // 0.4375

  test("in-domain scores match hand-derived KN probabilities; short docs absent") {
    val out = LmQuality.scoreDocuments(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("n_oov_ctx"), r.getAs[Double]("mean_p"))).toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 has no pairs
    assert(out(1L) == ((3L, 3L, 0L, ((0.0 + pAB) + pBA + pAB) / 3.0)))
    assert(out(2L) == ((2L, 2L, 0L, ((0.0 + pAB) + pBC) / 2.0)))
    assert(out(4L) == ((1L, 1L, 0L, pCQ / 1.0)))
  }

  test("cross-corpus: unseen bigram backs off, OOV context scores zero and is counted") {
    // "a c": context a IS in the model, bigram (a,c) is not →
    //   backoff-only = (d·n1f(a)/c1(a)) · (n1b(c)/B)
    // "z a": context z unseen → 0.0, one OOV pair
    val batch = Seq((10L, "a c"), (11L, "z a")).toDF("doc_id", "text")
    val out = LmQuality.scoreAgainst(corpus, batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("n_oov_ctx"), r.getAs[Double]("mean_p"))).toMap
    val backoff = ((0.75 * 1.0) / 3.0) * (1.0 / 4.0)
    assert(out(10L) == ((1L, 0L, 0L, (0.0 + backoff) / 1.0)))
    assert(out(11L) == ((1L, 0L, 1L, 0.0)))
  }

  test("the fold runs in document order and is partition-invariant") {
    val big = Seq.tabulate(40)(i => (i.toLong, "a b c a b a b c q x a b")).toDF("doc_id", "text")
    val r1 = LmQuality.scoreDocuments(big.repartition(1)).orderBy("doc_id")
      .select("mean_p").as[Double].collect().toSeq
    val r8 = LmQuality.scoreDocuments(big.repartition(8)).orderBy("doc_id")
      .select("mean_p").as[Double].collect().toSeq
    assert(r1 == r8) // bitwise: ordered fold is partitioning-independent
  }

  test("bucket thresholds classify head/middle/tail and reject inverted thresholds") {
    val df = Seq((1L, 0.05), (2L, 0.034), (3L, 0.01)).toDF("id", "p")
      .withColumn("b", LmQuality.bucketExpr(org.apache.spark.sql.functions.col("p"), 0.035, 0.033))
    assert(df.orderBy("id").select("b").as[String].collect().toSeq ==
      Seq("head", "middle", "tail"))
    intercept[IllegalArgumentException](
      LmQuality.bucketExpr(org.apache.spark.sql.functions.col("p"), 0.01, 0.02))
  }
}
