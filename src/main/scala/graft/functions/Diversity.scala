package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-slice DIVERSITY via distinct-n ratios (Li et al. NAACL
  * 2016's distinct-1/distinct-2, applied corpus-side): the fraction
  * of n-gram tokens that are DISTINCT within a slice — the
  * corpus-health counterpart of q58's within-document repetition.
  * A slice full of templated/boilerplate text (SEO farms, scraped
  * product grids) shows a collapsed distinct-2 long before any
  * per-document filter fires; mixing decisions (q69) want this per
  * source/language slice.
  *
  * Ratios are integer BASIS POINTS (distinct·10000 div total) — no
  * float division, engine-portable. Scale shape: distinct counting
  * runs as the two-stage aggregate ((slice, gram) partial counts,
  * then per-slice totals) — at 100 TB the first stage is the only
  * corpus-scale shuffle and it carries partial combines; nothing
  * ever holds a slice's vocabulary in one task's memory.
  */
object Diversity {

  /** Whitespace tokens, the established q20/q95 convention. */
  private def toks(textCol: String) =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)

  /** Per-slice distinct-1/distinct-2 table: totals, distincts, and
    * basis-point ratios.
    */
  def distinctNgrams(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(groupCol).as("grp"), toks(textCol).as("t"))
    val uni = t.select(col("grp"), explode(col("t")).as("w"))
      .groupBy("grp", "w").agg(count(lit(1)).as("c"))
      .groupBy("grp").agg(sum(col("c")).as("total_1"), count(lit(1)).as("distinct_1"))
    val bi = t
      .filter(size(col("t")) >= 2)
      .select(col("grp"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("w"))
      .groupBy("grp", "w").agg(count(lit(1)).as("c"))
      .groupBy("grp").agg(sum(col("c")).as("total_2"), count(lit(1)).as("distinct_2"))
    // `div`, not `/`: Spark's Divide is double division, whose
    // rounded quotient can truncate to the wrong integer near a
    // boundary — integer div is exact in both engines.
    // LEFT join (r15, ADVICE): a slice where every document has fewer
    // than 2 tokens has no bigram row — it must surface with
    // total_2 = distinct_2 = 0 and a NULL d2_bp, not vanish from the
    // diversity report without signal.
    uni.join(bi, Seq("grp"), "left")
      .select(col("grp"), col("total_1"), col("distinct_1"),
        expr("distinct_1 * 10000 div total_1").as("d1_bp"),
        coalesce(col("total_2"), lit(0L)).as("total_2"),
        coalesce(col("distinct_2"), lit(0L)).as("distinct_2"),
        expr("distinct_2 * 10000 div total_2").as("d2_bp"))
  }
}
