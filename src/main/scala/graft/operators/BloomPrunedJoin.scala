package graft.operators

import graft.functions.PortableBloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned shuffle join — the semi-join reduction for the awkward
  * middle ground where the dimension side is too large to broadcast
  * as a hash relation but its KEY BLOOM is not: build a bloom over
  * the small side's join keys, broadcast the bloom's set positions
  * (≤ min(k·|keys|, m) longs — m-bounded, 8 MB at m = 2^20 however
  * large the side grows), and filter the big side MAP-SIDE before its
  * exchange. A selective join's big-side shuffle shrinks by roughly
  * its selectivity; bloom false positives cost only wasted shuffled
  * rows — the real join still decides, so results are EXACTLY the
  * plain inner join's (spec-pinned, including null keys and duplicate
  * keys on both sides; false negatives are impossible — every present
  * key's positions are set). This is Spark's runtime row-level
  * filtering / Bloom join reduction made explicit and portable
  * (PortableBloom's md5 positions, q67's filter machinery).
  */
object BloomPrunedJoin {

  /** The big side reduced to rows whose key MIGHT join: k broadcast
    * position joins, all map-side, every column preserved. Public so
    * callers (and the spec) can stage or measure the reduction.
    */
  def pruneProbe(big: DataFrame, small: DataFrame, keyCol: String,
                 k: Int = 3, m: Int = 1 << 20): DataFrame = {
    val bloom = PortableBloom.build(small.select(col(keyCol)), keyCol, k, m)
    val tagged = big.withColumn("_ps", PortableBloom.positions(col(keyCol), k, m))
    val joined = (0 until k).foldLeft(tagged) { (df, i) =>
      df.join(broadcast(bloom.select(col("bloom_pos").as(s"_b$i"))),
        element_at(col("_ps"), i + 1) === col(s"_b$i"), "left")
    }
    joined.filter((0 until k).map(i => col(s"_b$i").isNotNull).reduce(_ && _))
      .drop("_ps" +: (0 until k).map(i => s"_b$i"): _*)
  }

  /** Inner equi-join with the big side bloom-pruned before its
    * shuffle. Result-identical to `big.join(small, keyCol)`.
    */
  def inner(big: DataFrame, small: DataFrame, keyCol: String,
            k: Int = 3, m: Int = 1 << 20): DataFrame =
    pruneProbe(big, small, keyCol, k, m).join(small, Seq(keyCol))
}
