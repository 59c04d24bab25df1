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

  test("signSignature packs leading-dim signs little-endian") {
    import org.apache.spark.sql.functions.col
    val sig = Seq((1L, Array(1f, -1f, 1f, -1f, 9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
      .select(SemDedup.signSignature(col("embedding"), 4).as("s"))
      .as[Long].head()
    assert(sig === (1L | 4L)) // dims 1 and 3 non-negative
  }
}
