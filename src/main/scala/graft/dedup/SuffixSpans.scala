package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT duplicated-span detection via a (truncated) SUFFIX ARRAY —
  * the exact tier of q71's hashed-window span dedup, and the method
  * the published substring-dedup work actually uses (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL
  * 2022: build a suffix array over the corpus, duplicated spans are
  * runs of adjacent suffixes with long common prefixes). q71 hashes
  * 60-bit windows (collision-probabilistic, fixed width); this sorts
  * the actual suffixes, so a flagged span is a REAL duplicate by
  * construction and the neighbor LCP measures its exact length.
  *
  * TRUNCATED-KEY variant: suffixes compare by their first `k` (48)
  * characters — sort keys are fixed-width (the property that makes a
  * distributed range sort of 100 TB of positions feasible at all),
  * and any duplicate span of length ∈ [minSpan, k] is detected
  * exactly (longer duplicates still flag; only their measured LCP
  * saturates at k). Detection is ADJACENT-NEIGHBOR: a position flags
  * iff its rank-neighbor in suffix order shares ≥ `minSpan` leading
  * characters — the standard SA-dedup criterion (equal spans sort
  * adjacent, so every duplicated span ≥ minSpan flags; the cross-doc
  * flag is a lower bound when a same-doc twin sorts between two
  * cross-doc twins).
  *
  * Scale shape: positions explode map-side (one row per character,
  * fixed-width key — at 100 TB this is the method's published cost
  * and strides/sampling bound it); the global suffix ORDER is a
  * distributed range sort + zipWithIndex (per-partition counts to
  * the driver, never rows — the q108 rank technique); neighbor LCPs
  * come from ONE rank-keyed self-join (each LCP computed once,
  * reused for both sides via a rank-shift join); the LCP itself is a
  * codegen'd in-row fold over ≤ k character compares, capped by both
  * key lengths so equal SHORT suffixes do not overcount. No window
  * over the global order (a bare ORDER BY window would funnel the
  * corpus through one task).
  */
object SuffixSpans {

  /** Per-document duplicated-span statistics: (doc_id, n_positions,
    * n_dup_pos, n_dup_cross, max_lcp, max_lcp_cross) — positions
    * whose suffix-order neighbor shares ≥ `minSpan` chars (any
    * neighbor / a neighbor from a DIFFERENT document), and the
    * longest observed neighbor LCPs.
    */
  def docStats(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 48, minSpan: Int = 20): DataFrame = {
    val (ranked, withPrev, result) = buildPlan(docs, idCol, textCol, k, minSpan)
    // ranked is withPrev's ancestor: one chain materialization fills
    // both caches (withCachedChain contract); the doc-scale result is
    // checkpointed once and every positions-scale cache released.
    graft.Exec.withCachedChain(Seq(ranked, withPrev))(result)
  }

  /** The operator tree without the eager chain materialization —
    * (ranked, withPrev, result); `result` is what DumpPlans explains
    * (docStats's executed form shows only the checkpoint scan).
    */
  private[graft] def buildPlan(docs: DataFrame, idCol: String, textCol: String,
                               k: Int, minSpan: Int): (DataFrame, DataFrame, DataFrame) = {
    require(k >= 1 && minSpan >= 1 && minSpan <= k,
      s"need 1 <= minSpan <= k, got k=$k minSpan=$minSpan")
    val spark = docs.sparkSession
    import spark.implicits._
    val pos = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .filter(length(col("t")) >= 1) // sequence(1,0) would DESCEND, not empty
      .select(col("id"), explode(sequence(lit(1), length(col("t")))).as("p"), col("t"))
      .select(col("id"), col("p"), expr(s"substring(t, p, $k)").as("key"))
    val ranked = pos
      .repartitionByRange(col("key"), col("id"), col("p"))
      .sortWithinPartitions(col("key"), col("id"), col("p"))
      .as[(Long, Int, String)].rdd.zipWithIndex()
      .map { case ((id, p, key), r) => (id, p, key, r) }
      .toDF("id", "p", "key", "rank")

    // LCP of two truncated keys: sequential fold over char compares
    // (acc advances only while every prefix char matched), capped by
    // both lengths — two equal short keys have LCP = their length,
    // not k ('' == '' beyond both ends would otherwise overcount).
    def lcp(a: Column, b: Column): Column =
      when(b.isNull, lit(0)).otherwise(least(
        aggregate(sequence(lit(1), lit(k)), lit(0), (acc, i) =>
          when(acc === i - 1 && a.substr(i, lit(1)) === b.substr(i, lit(1)), i)
            .otherwise(acc)),
        length(a), length(b)))

    val prevSide = ranked.select((col("rank") + 1).as("rank"),
      col("key").as("key_prev"), col("id").as("id_prev"))
    val withPrev = ranked.join(prevSide, Seq("rank"), "left")
      .select(col("rank"), col("id"), col("p"),
        coalesce(col("id_prev"), lit(-1L)).as("id_prev"),
        lcp(col("key"), col("key_prev")).as("lcp_prev"))
    // lcp_next(r) = lcp_prev(r+1): computed once, shifted back by a
    // second rank-keyed join instead of re-folding
    val nextSide = withPrev.select((col("rank") - 1).as("rank"),
      col("lcp_prev").as("lcp_next"), col("id").as("id_next"))
    val full = withPrev.join(nextSide, Seq("rank"), "left")
      .select(col("id"), col("p"),
        col("lcp_prev"), col("id_prev"),
        coalesce(col("lcp_next"), lit(0)).as("lcp_next"),
        coalesce(col("id_next"), lit(-1L)).as("id_next"))
    val crossPrev = when(col("id_prev") =!= col("id"), col("lcp_prev")).otherwise(0)
    val crossNext = when(col("id_next") =!= col("id"), col("lcp_next")).otherwise(0)
    val result = full.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_positions"),
        sum(when(col("lcp_prev") >= minSpan || col("lcp_next") >= minSpan, 1L)
          .otherwise(0L)).as("n_dup_pos"),
        sum(when(crossPrev >= minSpan || crossNext >= minSpan, 1L)
          .otherwise(0L)).as("n_dup_cross"),
        max(greatest(col("lcp_prev"), col("lcp_next"))).cast("long").as("max_lcp"),
        max(greatest(crossPrev, crossNext)).cast("long").as("max_lcp_cross"))
    (ranked, withPrev, result)
  }

  /** EXACT CROSS-CORPUS SUBSTRING CONTAMINATION — the decontamination
    * deployment of the suffix machinery (the GPT-3/Lee-et-al. eval
    * hygiene step q51 approximates with hashed n-grams): for every
    * EVAL document, does any ≥ `minSpan`-char span of it appear
    * verbatim ANYWHERE in the train corpus? Exact within the k-char
    * key truncation, because in suffix order the maximum LCP between
    * an eval suffix and ANY train suffix is attained at the rank-
    * NEAREST train suffix (LCP is min-decreasing along the sorted
    * order) — so each eval position needs only its nearest train
    * suffix above and below, not a quadratic comparison. Unlike
    * [[docStats]]' adjacent-neighbor lower bound, this is the exact
    * side-aware criterion: runs of eval suffixes cannot mask a train
    * match.
    *
    * Nearest-train lookup WITHOUT a global window funnel: rows are
    * range-partitioned by rank and scanned with PARTITION-LOCAL
    * ignore-null last/first windows; partition-boundary carries (the
    * last/first train key of every partition) are one numPartitions-
    * sized driver collect folded into case-when columns — the
    * ksTestCounts offsets technique, never a data collect.
    *
    * `docs` carries BOTH corpora with an `is_train` flag; ids must be
    * unique across the union (they tie-break the suffix order).
    * Output, per EVAL document: (doc_id, n_positions, n_contaminated,
    * max_train_lcp).
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    trainCol: String, k: Int = 48, minSpan: Int = 20): DataFrame = {
    require(k >= 1 && minSpan >= 1 && minSpan <= k,
      s"need 1 <= minSpan <= k, got k=$k minSpan=$minSpan")
    val spark = docs.sparkSession
    import spark.implicits._
    val pos = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"),
        col(trainCol).cast("boolean").as("tr"))
      .filter(length(col("t")) >= 1)
      .select(col("id"), col("tr"),
        explode(sequence(lit(1), length(col("t")))).as("p"), col("t"))
      .select(col("id"), col("tr"), col("p"), expr(s"substring(t, p, $k)").as("key"))
    // zipWithIndex assigns CONTIGUOUS ranks per partition in partition
    // order, so the partition index IS a valid range-bucket id — no
    // second rank exchange needed (3M-row shuffle saved)
    val ranked = pos
      .repartitionByRange(col("key"), col("id"), col("p"))
      .sortWithinPartitions(col("key"), col("id"), col("p"))
      .as[(Long, Boolean, Int, String)].rdd.zipWithIndex()
      .mapPartitionsWithIndex { (pid, it) =>
        it.map { case ((id, tr, p, key), r) => (id, tr, p, key, r, pid) }
      }
      .toDF("id", "tr", "p", "key", "rank", "_pid")

    graft.Exec.withCached(ranked) { rk =>
      // per-partition first/last TRAIN key — numPartitions rows to the
      // driver, never data
      val parts = rk.groupBy(col("_pid"))
        .agg(min_by(col("key"), when(col("tr"), col("rank"))).as("firstK"),
          max_by(col("key"), when(col("tr"), col("rank"))).as("lastK"))
        .collect().map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2))))
        .sortBy(_._1)
      // carry(before)(pid) = last train key of any EARLIER partition
      val before = parts.scanLeft(Option.empty[String]) {
        (acc, p) => p._3.orElse(acc)
      }.init
      val after = parts.scanRight(Option.empty[String]) {
        (p, acc) => p._2.orElse(acc)
      }.tail
      def carryCol(m: Seq[(Int, Option[String])]): Column =
        m.foldLeft(lit(null).cast("string")) { case (acc, (pid, kOpt)) =>
          kOpt.map(s => when(col("_pid") === pid, lit(s)).otherwise(acc)).getOrElse(acc)
        }
      val beforeCol = carryCol(parts.map(_._1).zip(before))
      val afterCol = carryCol(parts.map(_._1).zip(after))
      // BOTH lookups as RUNNING (unboundedPreceding → current) frames
      // — Spark evaluates running frames incrementally in O(n), where
      // an unbounded-FOLLOWING frame recomputes its aggregate per row
      // (O(n²) per partition: a hang at corpus scale). "Nearest train
      // after" = a running last() over the rank DESCENDING order.
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_pid")).orderBy(col("rank"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_pid")).orderBy(col("rank").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val withNearest = rk
        .withColumn("_kb", coalesce(
          last(when(col("tr"), col("key")), ignoreNulls = true).over(wB), beforeCol))
        .withColumn("_ka", coalesce(
          last(when(col("tr"), col("key")), ignoreNulls = true).over(wA), afterCol))
      // LCP as a short-circuiting JVM kernel, not a Column fold: the
      // fold evaluates all k steps with a substring allocation each
      // (no short-circuit inside higher-order functions) — at 1.5M
      // eval positions × 2 neighbors × 48 steps it dominated the
      // query (~3× total runtime); random suffix pairs mismatch
      // within a few chars, so the loop is ~20× cheaper. The ORACLE
      // keeps its list_reduce form — same VALUES, different engine.
      val evalRows = withNearest.filter(!col("tr"))
        .select(col("id"), col("key"), col("_kb"), col("_ka"))
        .as[(Long, String, String, String)]
        .mapPartitions(_.map { case (id, key, kb, ka) =>
          def l(b: String): Int = {
            if (b == null) 0
            else {
              val n = math.min(key.length, b.length)
              var i = 0
              while (i < n && key.charAt(i) == b.charAt(i)) i += 1
              i
            }
          }
          (id, math.max(l(kb), l(ka)))
        }).toDF("id", "_l")
      evalRows.groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_positions"),
          sum(when(col("_l") >= minSpan, 1L).otherwise(0L)).as("n_contaminated"),
          max(col("_l")).cast("long").as("max_train_lcp"))
    }
  }
}
