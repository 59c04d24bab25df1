package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training
  * corpora. `rand()`-based sampling (Spark `sample`/`sampleBy`) is
  * seed- and partitioning-dependent — re-running on a repartitioned
  * 100 TB corpus yields a DIFFERENT sample, which silently breaks
  * train/test hygiene. Hashing a stable key instead makes membership
  * a pure function of the row: reproducible across runs, engines,
  * partitionings, and incremental loads (new rows join their split
  * without reshuffling old ones).
  *
  * The hash is the first 8 hex chars of md5 (a well-distributed
  * 32-bit value every engine computes identically), mod the bucket
  * count — portable to any SQL engine for audits.
  */
object Sampling {

  /** Stable bucket in [0, n) from any key column. */
  def hashBucket(key: Column, n: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % n

  /** Split assignment by weight over 100 hash buckets: weights like
    * Seq("train" -> 90, "val" -> 5, "test" -> 5) (must sum to 100).
    */
  def splitLabel(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, s"split weights must sum to 100: $weights")
    val b = hashBucket(key, 100)
    val (expr, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, lo), (label, w)) =>
        (when(b >= lo && b < lo + w, label).otherwise(acc), lo + w)
    }
    expr
  }

  /** Deterministic p%-sample predicate (keep iff bucket < pct). */
  def sampledBy(key: Column, pct: Int, buckets: Int = 100): Column =
    hashBucket(key, buckets) < pct

  /** Stratified downsampling (data mixing): per-stratum keep
    * percentages — e.g. halve an over-represented language while
    * keeping the rest — with the same hash determinism as the flat
    * sample, so mixing decisions are reproducible and incremental
    * loads are consistent with prior runs. Strata not listed keep
    * `defaultPct`.
    */
  def stratifiedKeep(key: Column, stratum: Column, rates: Seq[(String, Int)],
                     defaultPct: Int = 100): Column = {
    require(rates.forall { case (_, p) => p >= 0 && p <= 100 },
      s"rates must be percentages: $rates")
    val pct = rates.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(stratum === s, p).otherwise(acc)
    }
    hashBucket(key, 100) < pct
  }
}
