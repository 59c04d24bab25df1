package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics beyond quantiles (q46) and per-column
  * profiling (q50).
  */
object Stats {

  /** Fixed-range equi-width histogram computed entirely in integer
    * space: bucket = ⌊(v − lo)·n / (hi − lo)⌋ over scaled-integer
    * values (cents for money), with underflow collected in bucket −1
    * and overflow in bucket n. One map-side-combined groupBy — a
    * single pass however large the input — and exact, unlike
    * sampling-based histogram sketches. Fixed [lo, hi) keeps it
    * one-pass; when bounds are unknown, q46's quantiles or q50's
    * min/max profile supply them with one extra pass.
    *
    * Output: (bucket, lo_cents, hi_cents, n, sum_cents, min_cents,
    * max_cents) — empty buckets absent (at 100 TB a dense-bucket
    * backfill is a driver-side array_join against `sequence()`, not a
    * data pass).
    */
  /** Exact EQUI-DEPTH histogram: `nBuckets` buckets of near-equal
    * population (sizes differ by at most one — bucket of the rank-r
    * value is ⌊r·b/n⌋), with true min/max/sum per bucket — the
    * histogram query optimizers and data-quality dashboards want
    * when the distribution is skewed and equi-width (above) piles
    * everything into one bar. Two corpus passes: a distributed range
    * sort + `zipWithIndex` contiguous ranks (driver sees only
    * per-partition counts, never data — the SortedNeighborhood rank
    * technique), then one map-side-combined groupBy on the derived
    * bucket id; the total count rides a one-row cross join, so no
    * driver scalar enters the plan. Deterministic under value ties
    * via the caller's tie-break columns; all bucket math is integer
    * (`div`), mirrored bit-for-bit by the oracle's row_number
    * formulation.
    */
  def equiDepthHistogram(df: DataFrame, valueCents: Column, tieBreaks: Seq[Column],
                         nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val cols = valueCents.cast("long").as("_v") +:
      tieBreaks.zipWithIndex.map { case (c, i) => c.as(s"_t$i") }
    val orderCols = col("_v") +: tieBreaks.indices.map(i => col(s"_t$i"))
    val ranked = df.select(cols: _*)
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .rdd.zipWithIndex()
      .map { case (row, r) => (row.getLong(0), r) }
      .toDF("_v", "_r")
    val tot = ranked.agg(count(lit(1)).cast("long").as("_n"))
    ranked.crossJoin(tot)
      .withColumn("bucket", expr(s"_r * $nBuckets div _n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo_cents"),
        max(col("_v")).as("hi_cents"), sum(col("_v")).as("sum_cents"))
  }

  def equiWidthHistogram(df: DataFrame, valueCents: Column,
                         loCents: Long, hiCents: Long, nBuckets: Int): DataFrame = {
    require(hiCents > loCents && nBuckets > 0, "need hi > lo and n > 0")
    val span = hiCents - loCents
    // (v - lo) * n must not overflow Long — the price of staying in
    // exact integer arithmetic. Cents over [0, 2^63/n) cover any real
    // money range; for wider domains pre-scale the value column.
    require(span <= Long.MaxValue / nBuckets,
      s"span * nBuckets overflows Long: span=$span n=$nBuckets")
    // `div` (IntegralDivide) keeps the arithmetic in Long end-to-end;
    // Column./ would route through double and can mis-bucket by one
    // once |(v-lo)·n| exceeds 2^53. Operands are non-negative in this
    // branch (lo ≤ v < hi), so truncation == floor.
    val b = when(valueCents < loCents, lit(-1L))
      .when(valueCents >= hiCents, lit(nBuckets.toLong))
      .otherwise(call_function("div", (valueCents - loCents) * nBuckets, lit(span)))
      .cast("long")
    df.select(b.as("bucket"), valueCents.as("_v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("sum_cents"),
        min(col("_v")).as("min_cents"), max(col("_v")).as("max_cents"))
      .select(col("bucket"),
        // bucket b holds v iff b ≤ (v-lo)·n/span < b+1, i.e. the
        // integer edge of bucket b is CEIL(b·span/n) — floor-div
        // edges would exclude values the assignment puts in b when
        // span % n ≠ 0. Ceil via (x + n - 1) div n (non-negative).
        when(col("bucket") === -1L, lit(null))
          .otherwise(lit(loCents) + call_function("div",
            col("bucket") * span + (nBuckets - 1), lit(nBuckets.toLong)))
          .cast("long").as("lo_cents"),
        when(col("bucket") === nBuckets.toLong, lit(null))
          .otherwise(lit(loCents) + call_function("div",
            (col("bucket") + 1) * span + (nBuckets - 1), lit(nBuckets.toLong)))
          .cast("long").as("hi_cents"),
        col("n"), col("sum_cents"), col("min_cents"), col("max_cents"))
  }
}
