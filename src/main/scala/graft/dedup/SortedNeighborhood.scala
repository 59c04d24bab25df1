package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
  * sort the corpus by a domain sort key, then emit every record pair
  * within `window` positions as a dedup/linkage candidate — the
  * third blocking family next to LSH (MinHashLsh — probabilistic)
  * and prefix filtering (SetSimJoin — exact-threshold): a FIXED
  * candidate budget of ≤ w·n pairs that catches near-sorted-together
  * records (typos in the key tail, swapped fields) regardless of any
  * similarity threshold, which is why record-linkage pipelines run
  * it alongside token blocking.
  *
  * Scale shape: the global order is produced by a RANGE partition +
  * within-partition sort (Spark's own distributed sort — no single-
  * partition funnel), and contiguous global ranks come from
  * `zipWithIndex`, whose driver involvement is one count per
  * partition (offsets), never data. Pairing never self-joins the
  * corpus at large: rows land in rank-buckets of width w (each row
  * also mirrored into its predecessor bucket), so the join is keyed
  * on bucket with ≤ 3w rows per bucket — candidate generation is
  * O(w·n) work in bucket-local joins, the published bound.
  *
  * This operator emits CANDIDATES (with rank distance and key
  * equality as evidence); scoring them is the caller's choice of
  * verifier (FuzzyMatch edit distance, SetSimJoin verification,
  * embedding cosine) — same separation as MinHashLsh's
  * candidate/verify tiers.
  */
object SortedNeighborhood {

  /** All pairs within `window` positions of the (key, id) global sort
    * order. Output: (id_a, id_b, rank_distance, same_key) where a
    * precedes b in the order; each unordered pair appears exactly
    * once.
    */
  def candidates(df: DataFrame, idCol: String, keyCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = df.sparkSession
    import spark.implicits._

    val ranked = df.select(col(idCol).cast("long").as("id"), col(keyCol).as("k"))
      .repartitionByRange(col("k"), col("id"))
      .sortWithinPartitions(col("k"), col("id"))
      .as[(Long, String)].rdd.zipWithIndex()
      .map { case ((id, k), r) => (id, k, r) }
      .toDF("id", "k", "rank")

    val a = ranked.select(col("id").as("id_a"), col("k").as("k_a"),
      col("rank").as("rank_a"), expr(s"rank div $window").as("bucket"))
    val b = ranked.select(col("id").as("id_b"), col("k").as("k_b"),
      col("rank").as("rank_b"),
      explode(array(expr(s"rank div $window"), expr(s"rank div $window - 1"))).as("bucket"))
    a.join(b, "bucket")
      .filter(col("rank_b") > col("rank_a") && col("rank_b") <= col("rank_a") + window)
      .select(col("id_a"), col("id_b"),
        (col("rank_b") - col("rank_a")).as("rank_distance"),
        (col("k_a") === col("k_b")).as("same_key"))
  }
}
