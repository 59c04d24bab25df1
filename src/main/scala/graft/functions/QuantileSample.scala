package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PORTABLE MERGEABLE QUANTILE SKETCH via deterministic bottom-k
  * hash sampling (the KMV idea pointed at quantiles): per group, keep
  * the k rows whose 60-bit md5(row key) is smallest — a uniform
  * simple random sample WITHOUT any RNG, because the "randomness" is
  * the hash of a stable unique key. Quantiles are then empirical
  * quantiles of the sample, with rank error O(n/√k) — and unlike
  * KLL/t-digest, whose compactions make the result depend on MERGE
  * ORDER, this sketch is a pure set: merge = union-keep-k-smallest,
  * commutative and associative, so any partitioning, any micro-batch
  * split, and the batch formulation all produce the BIT-IDENTICAL
  * sample (the repo's MG/CMS/HLL portability discipline applied to
  * quantiles; KLL would violate it). Small groups (≤ k rows) sample
  * themselves entirely — estimates become exact.
  *
  * Scale: the hash is map-side projection arithmetic; the corpus
  * pass runs through the native [[graft.plans.TopK]] heap exec
  * (bounded groups×k memory, no corpus sort); everything after is
  * sample-sized. The rank-error CERTIFICATE (exact rank of each
  * estimate vs its target) costs one extra counting pass over the
  * full data — the audit tier, optional at scale.
  */
object QuantileSample {

  /** 60-bit deterministic uniform from the row key (15 hex chars of
    * md5 — the Sampling.hashBucket family, wider so group sizes up to
    * ~2^30 stay collision-negligible).
    */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The per-group bottom-k sample: (group, key, value, hash) rows. */
  def sample(df: DataFrame, groupCol: String, keyCol: String, valueCol: Column,
             k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    val slim = df.select(col(groupCol).as("g"), col(keyCol).cast("long").as("id"),
        valueCol.cast("long").as("v"))
      .withColumn("hv", hash60(col("id")))
    graft.plans.TopK.perKey(slim, Seq("g"), Seq(col("hv").asc, col("id").asc), k)
  }

  /** Empirical quantile estimates from the bottom-k sample.
    *
    * @param ps percent targets (e.g. Seq(50, 90, 99)); the estimate
    *           for p is the sample value at 0-based rank
    *           ⌊p·(m−1)/100⌋ under (value, key) order, m = sample size
    * @return (g, p, est, m) — one row per group × target
    */
  def quantiles(df: DataFrame, groupCol: String, keyCol: String, valueCol: Column,
                k: Int, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100), s"bad targets: $ps")
    val s = sample(df, groupCol, keyCol, valueCol, k)
    val byValue = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val grp = Window.partitionBy(col("g"))
    val ranked = s
      .withColumn("vr", row_number().over(byValue).cast("long") - 1L)
      .withColumn("m", count(lit(1)).over(grp))
    val targets = array(ps.map(lit): _*)
    ranked
      .select(col("g"), col("v"), col("vr"), col("m"), explode(targets).as("p"))
      .filter(col("vr") ===
        call_function("div", col("p").cast("long") * (col("m") - 1L), lit(100L)))
      .select(col("g"), col("p").cast("long").as("p"), col("v").as("est"), col("m"))
  }

  /** Attach the audit certificate: the exact rank of each estimate in
    * the FULL data and the deterministic rank-error verdict
    * |100·rank − p·(n−1)|²·k ≤ 9·(100·n)² — the 3·n/√k bound as pure
    * integer arithmetic (decimal-exact on both engines).
    */
  def withCertificate(df: DataFrame, groupCol: String, keyCol: String,
                      valueCol: Column, k: Int, ests: DataFrame): DataFrame = {
    val full = df.select(col(groupCol).as("g"), valueCol.cast("long").as("v"))
    val totals = full.groupBy("g").agg(count(lit(1)).as("n"))
    val below = ests.alias("e")
      .join(full.alias("f"), col("e.g") === col("f.g") && col("f.v") < col("e.est"),
        "left")
      .groupBy(col("e.g").as("g"), col("e.p").as("p"), col("e.est").as("est"), col("e.m").as("m"))
      .agg(sum(when(col("f.v").isNotNull, 1L).otherwise(0L)).as("exact_rank"))
    val dec = "decimal(38,0)"
    val d100 = (lit(100L) * col("exact_rank") - col("p") * (col("n") - 1L)).cast(dec)
    below.join(totals, Seq("g"))
      .withColumn("within_bound",
        d100 * d100 * lit(k).cast(dec) <=
          (lit(9L).cast(dec) * (lit(100L) * col("n")).cast(dec) * (lit(100L) * col("n")).cast(dec)))
      .select(col("g"), col("p"), col("est"), col("m"), col("n"),
        col("exact_rank"), col("within_bound"))
  }
}
