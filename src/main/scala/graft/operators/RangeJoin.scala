package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark plans a raw
  * `p.ts >= i.start && p.ts < i.end` join as BroadcastNestedLoop
  * (only viable when the interval side broadcasts) or a cartesian —
  * both die when BOTH sides are large. The bucketed band join makes
  * the shuffle hash-keyed: pick a bucket width, explode every
  * interval into the buckets it overlaps, hash-join points on their
  * single bucket, then filter exact containment. Each matched pair
  * appears exactly once (a point lives in one bucket), and the blowup
  * is sum(interval_len / bucketWidth) interval rows — bounded by
  * choosing the width near the median interval length.
  *
  * Same family as DuckDB/Trino's IEJoin-style range optimizations and
  * the as-of join in graft.operators.AsOfJoin — this one covers the
  * overlapping-interval case as-of cannot express.
  */
object RangeJoin {

  /** Exact floor division that stays in integer space (ANSI-safe). */
  private def floorDiv(v: Column, w: Long): Column =
    ((v - pmod(v, lit(w))) / lit(w)).cast("long")

  /** Join points (one row per `pointKey` value) to all intervals
    * [startKey, endKey) containing them. Keys are integral (e.g.
    * epoch micros). Degenerate intervals (end <= start) match
    * nothing. Output: point columns + interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: String, startKey: String, endKey: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("_bucket", floorDiv(col(pointKey), bucketWidth))
    val iv = intervals
      .filter(col(endKey) > col(startKey))
      .withColumn("_bucket", explode(sequence(
        floorDiv(col(startKey), bucketWidth),
        floorDiv(col(endKey) - 1, bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .filter(col(pointKey) >= col(startKey) && col(pointKey) < col(endKey))
      .drop("_bucket")
  }
}
