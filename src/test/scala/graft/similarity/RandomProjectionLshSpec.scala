package graft.similarity

import graft.SparkSpec

class RandomProjectionLshSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters + noise: near-dup pairs exist inside clusters
  private lazy val vecs = {
    def v(base: Float, j: Int): Array[Float] =
      Array.tabulate(16)(i => base + (if (i == j % 16) 0.01f else 0.0f))
    (
      (0 until 5).map(j => (j.toLong, v(1.0f, j))) ++
      (5 until 10).map(j => (j.toLong, v(-1.0f, j))) ++
      Seq((10L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    ).toDF("vec_id", "embedding")
  }

  test("bucket collisions find within-cluster near-dups, not cross-cluster") {
    val pairs = RandomProjectionLsh.nearDuplicates(vecs, dim = 16, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // all within-cluster pairs are cosine ~1 and should collide in some table
    val cluster1 = for (a <- 0L until 5L; b <- a + 1 until 5L) yield (a, b)
    assert(cluster1.toSet.subsetOf(pairs), s"missing pairs: ${cluster1.toSet -- pairs}")
    // opposite clusters have cosine ~ -1: never above threshold
    assert(!pairs.exists { case (a, b) => a < 5 && b >= 5 && b < 10 })
  }

  test("assignments are deterministic") {
    val a1 = RandomProjectionLsh.assignBuckets(vecs, dim = 16)
      .select("vec_id", "table", "bucket").as[(Long, Int, Long)].collect().toSet
    val a2 = RandomProjectionLsh.assignBuckets(vecs, dim = 16)
      .select("vec_id", "table", "bucket").as[(Long, Int, Long)].collect().toSet
    assert(a1 == a2 && a1.nonEmpty)
  }
}
