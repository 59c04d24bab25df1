package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Deterministic TOKEN-BUDGET selection (data mixing to a budget):
    * within each group (typically language or domain), order docs by
    * their md5 hash — a reproducible shuffle, independent of engine
    * and partitioning — and keep the greedy prefix whose cumulative
    * token count stays within `budget`. "Give me ≤ B tokens of
    * Spanish, the same B tokens every run" is the operation a mixing
    * recipe actually needs; percentage sampling can't hit a token
    * target when doc lengths are skewed.
    *
    * Appends cum_tokens (inclusive running total in hash order) and
    * kept (cum_tokens ≤ budget). Determinism: the hash order has a
    * unique tiebreak (keyCol), so the prefix — and therefore the
    * selected token mass — is a pure function of the data.
    *
    * Scale: one window per group = one shuffle + per-group sort over
    * (group, hash, key, n_tokens) — 4 narrow columns, never text. For
    * extreme single-group skew, pre-aggregate a per-bucket token
    * histogram to find the cutoff hash, then broadcast-filter (same
    * output, no big sort).
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, keyCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .withColumn("kept", col("cum_tokens") <= budget)
  }

  /** Deterministic per-DOMAIN cap (the CommonCrawl-style policy
    * "at most N documents per domain/source"): rank docs inside each
    * domain by md5 hash with a unique tiebreak and keep the first
    * `cap`. Bounds any single domain's contribution to the corpus —
    * the standard guard against boilerplate-heavy hosts — while
    * staying reproducible across runs and incremental loads.
    * Appends domain_rank (1-based hash rank) and kept.
    */
  def domainCap(df: DataFrame, domainCol: String, keyCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("domain_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("domain_rank") <= cap)
  }

  /** TEMPERATURE-smoothed domain rebalancing at T = 2 (the mT5/UniMax
    * multilingual mixing family): downsample each domain so resulting
    * domain masses are proportional to sqrt(original mass) — big
    * domains flattened toward the small ones. The per-doc keep
    * probability is p_d = sqrt(min_domain_tokens / domain_tokens_d)
    * (the smallest domain keeps everything; a 100× larger domain
    * keeps 10%).
    *
    * ENGINE-EXACT without floats: keep ⟺ hashFrac < sqrt(r) ⟺
    * hashFrac² < r, so the Bernoulli draw is the all-integer
    * comparison h31² · domain_tokens < min_tokens · 2^62 with
    * h31 = the top 31 bits of the md5 hash (hashFrac = h31/2^31).
    * Decimal(38) on Spark / HUGEINT on the audit engine hold the
    * products exactly for domains up to 10^18 tokens — no pow(),
    * no libm, bit-identical everywhere, and as reproducible across
    * partitionings/engines/incremental loads as every other sampler
    * here. (General T needs floats; T = 2 is the common smoothing
    * and the one an exact audit can certify.)
    */
  def temperatureKeepT2(key: Column, domainTokens: Column, minTokens: Column): Column = {
    val h31 = shiftright(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), 1)
    (h31.cast("decimal(10,0)") * h31.cast("decimal(10,0)") * domainTokens.cast("decimal(18,0)")) <
      (minTokens.cast("decimal(18,0)") * lit(4611686018427387904L).cast("decimal(19,0)"))
  }

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

  /** WEIGHTED sampling without replacement via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM 54(6) 2007): per stratum, keep the k
    * rows with the largest priority w·2³² / (v+1), where v is the
    * row's deterministic 32-bit md5 value — the u = (v+1)/2³²
    * uniform makes the priority w/u, so inclusion probability rises
    * with weight and the scheme supports the DLT unbiased subset-sum
    * estimator: with τ = the (k+1)-th priority, E[Σ_sample max(w, τ)]
    * equals the stratum's total weight. Chosen over
    * Efraimidis–Spirakis (u^{1/w}) deliberately: THAT key needs
    * ln/pow — libm calls no two engines round identically — while
    * this one is a SINGLE IEEE division of exactly-representable
    * integers (weight ≤ 2²⁰ documented; both operands < 2⁵³), so
    * every engine computes the identical double bit-for-bit and the
    * sample is as reproducible as the hash splits above.
    *
    * Scale: the priority is map-side projection arithmetic; the
    * corpus pass runs through the native [[graft.plans.TopK]] heap
    * exec — bounded strata×(k+1) memory, no full sort, no corpus
    * window — and only the k+1-per-stratum survivors see the rank
    * window that numbers the sample and extracts τ.
    *
    * Output: (stratum, key, weight, pr, sample_rank ∈ [1, k],
    * tau — 0.0 when the stratum has ≤ k rows, per DLT).
    */
  def prioritySample(df: DataFrame, stratumCol: String, keyCol: String,
                     weightCol: String, k: Int, seed: String = "prio"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val slim = df
      .filter(col(weightCol) > 0)
      .select(col(stratumCol).as("stratum"), col(keyCol).cast("long").as("key"),
        col(weightCol).cast("long").as("weight"))
    val v = conv(substring(md5(concat(lit(seed + ":"), col("key").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val withPr = slim.withColumn("pr",
      (col("weight") * lit(4294967296L)).cast("double") / (v + lit(1L)).cast("double"))
    val top = graft.plans.TopK.perKey(withPr, Seq("stratum"),
      Seq(col("pr").desc, col("key").asc), k + 1)
    val order = Window.partitionBy(col("stratum")).orderBy(col("pr").desc, col("key").asc)
    val stratum = Window.partitionBy(col("stratum"))
    top
      .withColumn("sample_rank", row_number().over(order).cast("long"))
      .withColumn("tau", coalesce(
        max(when(col("sample_rank") === k + 1, col("pr"))).over(stratum), lit(0.0)))
      .filter(col("sample_rank") <= k)
  }
}
