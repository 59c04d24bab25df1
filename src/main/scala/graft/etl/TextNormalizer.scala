package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the reference's text normalization
  * (reference: restaurant_etl/utils/clean_text.py:3 normalize_extracted_text).
  *
  * The reference walks lines in Python one string at a time; here the
  * whole thing is a single column expression pipeline (regexp_replace +
  * higher-order array functions), so it runs vectorized inside the JVM
  * on every partition with no per-row interpreter cost and survives
  * whole-stage codegen around it. At 100 TB this is a map-only stage:
  * no shuffle, pushdown-friendly (doc projection reaches the scan).
  *
  * Steps (identical semantics to the reference):
  *  1. `--- Page N ---` markers → newline
  *  2. per line: trim; drop lines of length <= 1; drop punctuation-only
  *     lines; collapse `..`+ runs to a space
  *  3. collapse 2+ newlines to exactly two; collapse runs of
  *     spaces/tabs to one; trim
  */
object TextNormalizer {

  def normalize(text: Column): Column = {
    val noMarkers = regexp_replace(text, "(?i)-{2,}\\s*Page\\s*\\d+\\s*-{2,}", "\n")
    val lines = split(noMarkers, "\n")
    val kept = filter(
      transform(lines, l => regexp_replace(trim(l), "\\.{2,}", " ")),
      l => length(trim(l)) > 1 && !trim(l).rlike("^[\\W_]+$")
    )
    val joined = array_join(transform(kept, l => trim(l)), "\n")
    val collapsed = regexp_replace(
      regexp_replace(joined, "\\n{2,}", "\n\n"),
      "[ \\t]{2,}", " ")
    trim(collapsed)
  }

  /** Chunking for downstream (LLM-ish) consumers — reference
    * restaurant_etl/parsers/llm_parser.py:169 _chunk_text splits into
    * fixed-size character windows. Returns an array column of chunks;
    * pair with `posexplode` for (chunk_idx, chunk) rows.
    */
  def chunks(text: Column, maxChars: Int): Column = {
    val n = greatest(ceil(length(text) / lit(maxChars.toDouble)).cast("int"), lit(1))
    transform(
      sequence(lit(0), n - 1),
      i => text.substr(lit(1) + i * maxChars, lit(maxChars))
    )
  }
}
