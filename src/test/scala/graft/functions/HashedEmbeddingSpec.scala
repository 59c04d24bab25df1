package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C121 — hashing-trick embeddings: dimensionality and norm
  * invariants, zero-token docs, sign-cancellation coherence
  * (identical texts → identical vectors; disjoint vocab → expected
  * near-orthogonality is NOT asserted — it's probabilistic — but
  * self-cosine is), and partition invariance.
  */
class HashedEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta gamma alpha"), // exact dup of 1
    (3L, "delta epsilon zeta eta theta"),
    (4L, "   "),
    (5L, "")).toDF("doc_id", "text")

  test("fixed dim, exact norm2, zero vector for token-free docs") {
    val e = HashedEmbedding.embed(docs, "doc_id", "text", dim = 32)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(e.keySet === Set(1L, 2L, 3L, 4L, 5L), "every doc gets a row")
    e.values.foreach { case (v, n) =>
      assert(v.length === 32)
      assert(n === v.map(x => x * x).sum, "norm2 is the exact sum of squares")
    }
    assert(e(4L)._1.forall(_ == 0L) && e(5L)._1.forall(_ == 0L),
      "token-free docs embed to the zero vector")
    assert(e(1L) === e(2L), "identical text embeds identically")
    // total signed mass: |Σ v| ≤ token count, Σ |v| ≤ token count
    assert(e(1L)._1.map(math.abs).sum <= 4L)
  }

  test("partition invariance") {
    def run(parts: Int) =
      HashedEmbedding.embed(docs.repartition(parts), "doc_id", "text", dim = 32)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
        .sortBy(_._1).toList
    assert(run(1) === run(7))
  }

  test("retrieval over self-computed embeddings ranks the exact duplicate at cosine 1") {
    val e = HashedEmbedding.embed(docs, "doc_id", "text", dim = 32)
    val q = e.filter($"doc_id" === 1L)
      .select($"doc_id".as("query_id"), $"embedding".as("_qe"), $"norm2".as("_qn"))
    val top = q.crossJoin(e.select($"doc_id", $"embedding", $"norm2"))
      .withColumn("dot", aggregate(zip_with($"_qe", $"embedding", (a, b) => a * b),
        lit(0L), (acc, v) => acc + v))
      .withColumn("cosine", when($"_qn" === 0L || $"norm2" === 0L, lit(0.0))
        .otherwise($"dot".cast("double") /
          (sqrt($"_qn".cast("double")) * sqrt($"norm2".cast("double")))))
      .orderBy($"cosine".desc, $"doc_id")
      .select("doc_id", "cosine").as[(Long, Double)].collect()
    // sqrt(n)·sqrt(n) rounds one ulp off n, so self-cosine is 1±1e-15
    // (deterministically, the same on both engines — the oracle hashes
    // the exact double); assert ranking + closeness, not bit equality
    assert(top(0)._1 === 1L && top(1)._1 === 2L,
      s"self and exact dup must rank first: ${top.toSeq}")
    assert(math.abs(top(0)._2 - 1.0) < 1e-12 && top(0)._2 === top(1)._2)
    assert(top.last._2 === 0.0, "the zero-vector docs sit at cosine 0")
  }
}
