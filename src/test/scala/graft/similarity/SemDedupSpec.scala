package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row

/** SemDedup — sign-signature blocking and min-id-keeper verdicts. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Float*): Array[Float] =
    (v ++ Seq.fill(8 - v.length)(0.1f)).toArray

  test("exact and near copies are duplicates of the smallest matching id") {
    val vecs = Seq(
      (1L, pad(1f, 2f, 3f)),
      (2L, pad(1f, 2f, 3f)), // exact copy of 1
      (3L, pad(1.0001f, 2.0002f, 3.0003f)), // near copy of 1
      (4L, pad(-5f, 1f, 1f)) // different signature bucket
    ).toDF("vec_id", "embedding")
    val v = SemDedup.verdicts(vecs, dim = 8, threshold = 0.999, signBits = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(v(1L).getAs[Boolean]("kept"))
    assert(!v(2L).getAs[Boolean]("kept") && v(2L).getAs[Long]("dup_of") === 1L)
    assert(!v(3L).getAs[Boolean]("kept") && v(3L).getAs[Long]("dup_of") === 1L)
    assert(v(4L).getAs[Boolean]("kept"))
    assert(v(2L).getAs[Long]("n_matches") === 1L) // (1,2); (2,3)? both match
    assert(v(3L).getAs[Long]("n_matches") === 2L) // matches both 1 and 2
  }

  test("blocking contract: a flipped sign dim hides an otherwise-identical pair") {
    val vecs = Seq(
      (1L, pad(0.001f, 2f, 3f)),
      (2L, pad(-0.001f, 2f, 3f)) // cosine ~1 but signature differs
    ).toDF("vec_id", "embedding")
    val v = SemDedup.verdicts(vecs, dim = 8, threshold = 0.9, signBits = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(v(1L).getAs[Boolean]("kept") && v(2L).getAs[Boolean]("kept"),
      "sign-blocked pair must be missed BY DESIGN (documented recall tradeoff)")
  }

  test("IVF-centroid blocking reaches the same verdicts as sign blocking on planted dups") {
    // two well-separated clusters, each carrying planted near-dups:
    // any sane blocking (sign orthants OR trained centroids) keeps
    // each cluster in one bucket, so verdicts must agree pair-for-pair
    val around = (base: Array[Float], id: Long, eps: Float) =>
      (id, base.map(_ + eps))
    val cA = pad(10f, 10f, 10f)
    val cB = pad(-10f, -10f, 10f)
    val vecs = Seq(
      around(cA, 1L, 0f), around(cA, 2L, 0.0001f), around(cA, 3L, 0.0002f),
      around(cB, 4L, 0f), around(cB, 5L, 0.0001f),
      (6L, pad(0f, 10f, -10f)) // its own region, kept under both
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.trainCentroids(vecs, dim = 8, nCentroids = 3, refinements = 2)
    val bySign = SemDedup.verdicts(vecs, dim = 8, threshold = 0.999, signBits = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val byIvf = SemDedup.verdictsIvf(vecs, dim = 8, threshold = 0.999, model)
      .collect().map(r => r.getLong(0) -> r).toMap
    (1L to 6L).foreach { id =>
      assert(byIvf(id).getAs[Boolean]("kept") === bySign(id).getAs[Boolean]("kept"),
        s"vec $id: kept verdict diverged between blockings")
      assert(byIvf(id).getAs[Any]("dup_of") === bySign(id).getAs[Any]("dup_of"),
        s"vec $id: keeper election diverged between blockings")
    }
    assert(!byIvf(2L).getAs[Boolean]("kept") && byIvf(2L).getAs[Long]("dup_of") === 1L)
    assert(!byIvf(5L).getAs[Boolean]("kept") && byIvf(5L).getAs[Long]("dup_of") === 4L)
    assert(byIvf(6L).getAs[Boolean]("kept"))
  }

  test("verdictsIvf rejects a model trained at a different dimension") {
    val vecs = Seq((1L, pad(1f, 2f))).toDF("vec_id", "embedding")
    val model = IvfIndex.Model(4, Array((0, Array(0.0, 0.0, 0.0, 0.0))))
    val ex = intercept[IllegalArgumentException](
      SemDedup.verdictsIvf(vecs, dim = 8, threshold = 0.9, model))
    assert(ex.getMessage.contains("dim"))
  }

  test("signSignature packs leading-dim signs little-endian") {
    import org.apache.spark.sql.functions.col
    val sig = Seq((1L, Array(1f, -1f, 1f, -1f, 9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
      .select(SemDedup.signSignature(col("embedding"), 4).as("s"))
      .as[Long].head()
    assert(sig === (1L | 4L)) // dims 1 and 3 non-negative
  }
}
