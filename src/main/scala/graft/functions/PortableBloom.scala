package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable Bloom filter, expressed relationally: the filter
  * is the DISTINCT SET of hash positions its keys set (position p in
  * the table ⟺ bit p set in a bit-array encoding), and membership is
  * "every one of the key's k positions is present". Both sides are
  * pure `functions._` column expressions over md5 — deterministic,
  * codegen'd, and mirrorable in any SQL engine for audits (same
  * md5-fold trick as Sampling.hashBucket / q44).
  *
  * This is the scale path for set-membership filtering when the probe
  * set outgrows an exact broadcast of its keys: q51's decontamination
  * broadcasts the test set's distinct 8-gram STRINGS (~50+ B each); a
  * real benchmark-suite contamination set at 100 TB is billions of
  * grams — too big as strings, but m = 2^27 bloom positions is ≤ 1 GB
  * of longs here and 16 MB as the equivalent bit array. The relation
  * ⟶ bit-array step is mechanical (groupBy(pos / 64) +
  * bit_or(1 << pos % 64) → broadcast long[]); this module keeps the
  * relational form so the false-positive behavior itself is
  * hash-checked against the oracle, false positives included.
  *
  * Classic guarantees: NO false negatives, ever (an inserted key's
  * positions are all present by construction); false-positive rate
  * ≈ (1 − e^(−kn/m))^k for n inserted keys.
  */
object PortableBloom {

  /** The key's k hash positions in [0, m), one per hash row (two
    * rows may collide on one position; both then read the same set
    * bit, so verdicts equal a distinct-position check).
    */
  def positions(key: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 8, s"k out of range: $k")
    require(m >= 16, s"m too small: $m")
    array((0 until k).map { i =>
      conv(substring(md5(concat(lit(s"$i:"), key)), 1, 15), 16, 10).cast("long") % m
    }: _*)
  }

  /** Build the filter: one `bloom_pos` row per distinct set position. */
  def build(keys: DataFrame, keyCol: String, k: Int, m: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), k, m)).as("bloom_pos")).distinct()

  /** Membership test per (idCols, keyCol) row: appends
    * `might_contain` — true iff every position of the key is present
    * in `bloom`. Implemented as k BROADCAST left-joins (one per hash
    * row) — membership is entirely MAP-SIDE: the probe side is never
    * exploded, shuffled, or re-aggregated, which is the shape that
    * lets a 100 TB scan stream through the filter at full width.
    * (Two hash rows colliding on one position both read the same
    * set bit — verdict identical to a distinct-position check.)
    */
  def mightContain(keys: DataFrame, idCols: Seq[String], keyCol: String,
                   bloom: DataFrame, k: Int, m: Int): DataFrame = {
    val grouped = (idCols :+ keyCol).map(col)
    val ps = positions(col(keyCol), k, m)
    val joined = (0 until k).foldLeft(
      keys.select(grouped :+ ps.as("_ps"): _*)) { (df, i) =>
      df.join(broadcast(bloom.select(col("bloom_pos").as(s"_b$i"))),
        element_at(col("_ps"), i + 1) === col(s"_b$i"), "left")
    }
    joined.select(grouped :+
      (0 until k).map(i => col(s"_b$i").isNotNull).reduce(_ && _).as("might_contain"): _*)
  }

  /** Per-doc decontamination verdict against a pre-built gram bloom:
    * (id, n_grams, n_flagged, contaminated) for each input doc — the
    * corpus-side half of the q67 check, reusable per micro-batch by
    * the streaming ingest path (the filter is static; the doc side is
    * one tokenize + membership pass, nothing corpus-wide).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    bloom: DataFrame, k: Int, m: Int, gramN: Int): DataFrame = {
    // wordShingles array_distincts per doc, so (id, gram) is already
    // unique — no global distinct (that shuffle is corpus-gram-scale).
    val grams = docs.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), gramN)).as("gram"))
    val flagged = mightContain(grams, Seq(idCol), "gram", bloom, k, m)
      .groupBy(idCol).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("might_contain"), 1L).otherwise(0L)).as("n_flagged"))
    docs.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        (coalesce(col("n_flagged"), lit(0L)) > 0).as("contaminated"))
  }
}
