package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CORPUS-level boilerplate line removal (the RefinedWeb/CCNet
  * companion to q53's within-document line dedup): a line that occurs
  * in at least `minDocs` DISTINCT documents is boilerplate — nav
  * bars, cookie banners, footers, promo strips — and is stripped from
  * every document, preserving the relative order of what remains.
  *
  * The reference cleans only page markers and punctuation runs
  * (clean_text.py); corpus-frequency boilerplate detection requires
  * seeing the whole corpus at once, which is exactly what a
  * distributed engine adds over its per-file loop.
  *
  * Scale shape: one explode → (line-hash) aggregation — the shuffle
  * carries (md5, doc_id) pairs, never the line text beyond the hash —
  * then an anti-join of the exploded lines against the (small:
  * boilerplate is by definition a tiny distinct set) frequent-hash
  * table, and a per-document reassembly groupBy. Three narrow
  * shuffles, all key-hashed; no window over the corpus.
  */
object Boilerplate {

  /** Per-document cleaning record: n_lines (original), n_kept, and
    * md5 of the cleaned (order-preserving) rejoined text. Documents
    * whose every line was boilerplate yield the md5 of "".
    */
  def removeFrequentLines(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", minDocs: Long = 10L): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, split(col(textCol), "\n").as("_lines"))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
    val lines = base.select(id, col("n_lines"),
        posexplode(col("_lines")).as(Seq("_no", "_line")))
      .withColumn("_lh", md5(col("_line")))
    val frequent = lines.groupBy(col("_lh"))
      .agg(countDistinct(id).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("_lh"))
    val kept = lines.join(frequent, Seq("_lh"), "left_anti")
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("_no"), col("_line")))),
            s => s.getField("_line")),
          "\n")).as("cleaned_md5"))
    base.select(id, col("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(id, col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
  }
}
