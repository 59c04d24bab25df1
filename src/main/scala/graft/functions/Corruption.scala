package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5/UL2-style SPAN CORRUPTION — the last text transform before a
  * denoising pre-training run tokenizes: mask ~1/`rate` of the token
  * positions, collapse consecutive masked tokens into spans, replace
  * each span in the INPUT stream with a numbered sentinel and emit
  * the TARGET stream as sentinel+span pairs (Raffel et al. JMLR
  * 2020, §3.1.4's objective — the published denoising recipe).
  *
  * Everything is deterministic and engine-portable: the mask decision
  * is the house md5-fold over (doc_id, position) — reproducible
  * across runs, engines and partitionings, which is what makes the
  * corruption auditable (the same corpus always yields the same
  * training pairs, and a DuckDB oracle replays every piece).
  *
  * Output is RELATIONAL, not re-concatenated strings: one row per
  * emitted piece, (doc_id, stream ∈ input|target, ord, piece), where
  * `ord` = 2·pos for kept tokens and 2·pos−1 for the sentinel at a
  * span start — ordering by `ord` reads off each stream without any
  * per-doc string fold (a 100 TB corpus never funnels a document
  * through a string accumulator; the downstream tokenizer consumes
  * the stream in order).
  *
  * Scale shape: one explode pass; the span structure (previous-masked
  * flag, running sentinel index) is two windows partitioned BY
  * DOCUMENT — bounded by document length, never corpus-scale.
  */
object Corruption {

  /** One row per emitted piece of the corrupted INPUT stream and the
    * denoising TARGET stream. `rate` = mask 1-in-rate positions.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  rate: Int = 5): DataFrame = {
    require(rate >= 2, s"rate must be >= 2: $rate")
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("_p0", "tok")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"), col("tok"))
      .withColumn("masked",
        pmod(conv(substring(md5(concat_ws(":", col("doc_id"), col("pos"))), 1, 15),
          16, 10).cast("long"), lit(rate.toLong)) === 0L)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = toks
      .withColumn("span_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(byDoc), lit(false)))
      .withColumn("k",
        (sum(when(col("span_start"), 1L).otherwise(0L)).over(byDoc) - 1L))
    val inputKept = marked.filter(!col("masked"))
      .select(col("doc_id"), lit("input").as("stream"),
        (col("pos") * 2).as("ord"), col("tok").as("piece"))
    val inputSentinels = marked.filter(col("span_start"))
      .select(col("doc_id"), lit("input").as("stream"),
        (col("pos") * 2 - 1).as("ord"),
        concat(lit("<extra_id_"), col("k").cast("string"), lit(">")).as("piece"))
    val targetSentinels = marked.filter(col("span_start"))
      .select(col("doc_id"), lit("target").as("stream"),
        (col("pos") * 2 - 1).as("ord"),
        concat(lit("<extra_id_"), col("k").cast("string"), lit(">")).as("piece"))
    val targetMasked = marked.filter(col("masked"))
      .select(col("doc_id"), lit("target").as("stream"),
        (col("pos") * 2).as("ord"), col("tok").as("piece"))
    inputKept.unionByName(inputSentinels)
      .unionByName(targetSentinels).unionByName(targetMasked)
  }
}
