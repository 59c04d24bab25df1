package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPAN-level (substring) exact dedup: find runs of ≥ w consecutive
  * tokens shared verbatim across documents — the duplication class
  * document-level dedup (q19/q25) misses entirely (two long articles
  * quoting the same paragraph are not near-duplicate DOCUMENTS, but
  * the paragraph is still memorization fuel), and repetition rules
  * (q58) only see within one doc. The published treatment
  * (suffix-array substring dedup) is single-node; the distributed
  * stand-in is the standard hashed-sliding-window reduction: every
  * stride-1 w-token window is hashed, a window hash seen in ≥ 2
  * distinct docs marks its span duplicated, and per-doc flagged
  * positions are merged into islands (interval union) to measure the
  * duplicated token mass exactly.
  *
  * Scale shape, in order of cost:
  *  - the window fan-out is inherently token-scale (n_tokens rows per
  *    doc at stride 1 — the same lower bound a suffix array pays);
  *    each row is (id, pos, 60-bit hash), fixed-width — the text
  *    itself is never shuffled. A stride s > 1 on the PROBE side cuts
  *    the fan-out s× at the cost of missing spans shorter than
  *    w + s − 1 tokens; stride 1 on both sides is exact for ≥ w.
  *  - the duplicated-hash set is corpus-dependent and unbounded, so
  *    flagging is a shuffle semi-join on the 8-byte hash (AQE handles
  *    the skew of a boilerplate hash appearing in millions of docs),
  *    NOT a broadcast.
  *  - island merging is a per-doc window function over flagged
  *    positions only (already ≪ token scale after the semi-join) —
  *    partitioned by doc, never a global sort.
  * The window arrays are computed twice (once for the dup-set branch,
  * once for the flag join) — deliberate: re-running a map stage is
  * cheaper at corpus scale than caching a token-scale explode (same
  * trade as q58's re-tokenize).
  *
  * Window hashes are the repo's portable md5 fold (first 15 hex chars
  * → 60-bit long, as in PortableBloom/Sampling), so the DuckDB oracle
  * reproduces them bit-for-bit, hash collisions included (a collision
  * would flag the same false span in both engines — verdicts still
  * hash-match; at 60 bits the expected collision count is ~0 until
  * ~2^30 distinct windows per corpus).
  *
  * Reference scope: the reference pipeline has no span operator
  * (its unit is the whole menu document); this is part of the
  * mandated beyond-reference training-data surface.
  */
object SpanDedup {

  private def bound(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** Hashes of the text's stride-1 w-token windows (lowercased
    * whitespace tokens), index = 0-based start position. Docs shorter
    * than w tokens yield an empty array.
    */
  def windowHashes(text: Column, w: Int): Column = {
    require(w >= 2, s"window too small: $w")
    bound(TextFunctions.tokens(lower(text))) { toks =>
      val cnt = size(toks) - (w - 1)
      val idx = when(cnt < 1, array().cast("array<int>")).otherwise(sequence(lit(1), cnt))
      transform(idx, i =>
        conv(substring(md5(concat_ws(" ", slice(toks, i, lit(w)))), 1, 15), 16, 10).cast("long"))
    }
  }

  /** Per-document span-duplication stats against the whole corpus:
    * (id, n_tokens, n_windows, n_dup_windows, dup_tokens,
    * has_dup_span) where dup_tokens is the EXACT token mass covered
    * by the interval union of all flagged windows [pos, pos+w).
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val win = docs.select(col(idCol),
      posexplode(windowHashes(col(textCol), w)).as(Seq("pos", "whash")))
    // hash → distinct-doc count ≥ 2: per-doc dedup of (id, whash)
    // first so a window repeated WITHIN one doc doesn't fake a
    // cross-doc dup (that class belongs to q58)
    val dup = win.select(col(idCol), col("whash")).distinct()
      .groupBy("whash").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select("whash")
    val flagged = win.join(dup, Seq("whash"), "left_semi")
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    // interval union of [pos, pos+w): a gap > w starts a new island
    // (gap == w is touching — merged; identical coverage either way,
    // and both engines must use the same rule for the hash check)
    val isl = flagged
      .withColumn("_prev", lag("pos", 1).over(byPos))
      .withColumn("_isl", sum(
        when(col("_prev").isNull || col("pos") - col("_prev") > w, 1L).otherwise(0L)).over(byPos))
    val cov = isl.groupBy(col(idCol), col("_isl"))
      .agg(count(lit(1)).as("_nw"),
        (max(col("pos")) - min(col("pos")) + w).cast("long").as("_cov"))
      .groupBy(idCol)
      .agg(sum(col("_nw")).as("n_dup_windows"), sum(col("_cov")).as("dup_tokens"))
    docs.select(col(idCol),
      size(TextFunctions.tokens(lower(col(textCol)))).cast("long").as("n_tokens"))
      .withColumn("n_windows", greatest(col("n_tokens") - (w - 1), lit(0L)))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("n_dup_windows"), lit(0L)) > 0).as("has_dup_span"))
  }

  /** The REMEDY: remove duplicated spans, keeping exactly ONE
    * occurrence corpus-wide — for each duplicated window hash the
    * min-id doc keeps its span; every other doc's covered token range
    * is cut (published substring-dedup treatment: keep one, drop the
    * rest; the survivor choice just has to be deterministic, and
    * min-id matches the repo's keeper convention). Loser windows
    * merge into interval-union islands exactly as in `spanStats`, and
    * the cleaned text is the lowercased token sequence minus covered
    * positions, single-space joined (whitespace-normalized — the same
    * canonicalization the window hashing applies).
    *
    * Output: (id, n_tokens, n_removed_tokens, cleaned_text) per doc.
    * Same shuffle shape as spanStats plus one per-doc island
    * collect_list (bounded by islands per doc, not tokens).
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val win = docs.select(col(idCol),
      posexplode(windowHashes(col(textCol), w)).as(Seq("pos", "whash")))
    // duplicated hashes with their keeper (min doc id among sharers)
    val owners = win.select(col(idCol), col("whash")).distinct()
      .groupBy("whash").agg(count(lit(1)).as("_nd"), min(col(idCol)).as("_keeper"))
      .filter(col("_nd") >= 2).select(col("whash"), col("_keeper"))
    val lose = win.join(owners, Seq("whash")).filter(col(idCol) =!= col("_keeper"))
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val isl = lose
      .withColumn("_prev", lag("pos", 1).over(byPos))
      .withColumn("_isl", sum(
        when(col("_prev").isNull || col("pos") - col("_prev") > w, 1L).otherwise(0L)).over(byPos))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("pos")).as("_s"), (max(col("pos")) + w - 1).cast("long").as("_e"))
      .groupBy(idCol)
      .agg(collect_list(struct(col("_s").cast("long").as("s"), col("_e").as("e"))).as("_cuts"))
    docs.join(isl, Seq(idCol), "left")
      .select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("_toks"),
        coalesce(col("_cuts"), array().cast("array<struct<s:bigint,e:bigint>>")).as("_cuts"))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        col("_toks"), col("_cuts"))
      .withColumn("_kept", filter(
        transform(col("_toks"), (t, i) => struct(t.as("t"), i.cast("long").as("i"))),
        s => !exists(col("_cuts"), r => s("i") >= r("s") && s("i") <= r("e"))))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("_kept"))).cast("long").as("n_removed_tokens"),
        array_join(transform(col("_kept"), s => s("t")), " ").as("cleaned_text"))
  }
}
