package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline.
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd / JVM higher-order functions) — no UDFs, so the hot
  * path stays inside whole-stage codegen and a 100 TB corpus pass is
  * scan + map only.
  */
object TextFunctions {

  /** Whitespace tokens. Empty/blank text → empty array (split of ""
    * yields [""], which we filter).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-regex token count: letter runs, digit runs, and
    * single non-alnum marks — the classic pre-tokenizer split.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val StopWords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Stopword ratio over whitespace tokens (0.0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = size(filter(toks, t => t.isin(StopWords: _*)))
    when(size(toks) === 0, 0.0).otherwise(stops.cast("double") / size(toks))
  }

  /** Mean token length (0.0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val total = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    when(size(toks) === 0, 0.0).otherwise(total.cast("double") / size(toks))
  }

  /** Punctuation character ratio (punct chars / all chars). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val p = n - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(n === 0, 0.0).otherwise(p.cast("double") / n)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, low
    * stopword skew, word-like mean token length, low punctuation —
    * the usual cheap pre-filter for LLM training corpora.
    */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Unrounded variant — used where results are compared bit-exact
    * against a mirrored SQL expression (engine round() differs in the
    * last ULP; the mirrored arithmetic itself does not).
    */
  def qualityScoreRaw(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = lit(1.0) - abs(stopwordRatio(text) - 0.1)
    val wordScore = when(meanTokenLen(text).between(3.0, 8.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    lenScore * 0.3 + stopScore * 0.3 + wordScore * 0.2 + punctScore * 0.2
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across runs/engines — the exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling (polynomial) hash of the normalized text mod 1e9+7,
    * computed with a higher-order aggregate over characters — a cheap
    * LSH-able signature. Modular so it never overflows Long (Spark 4
    * runs ANSI mode, where overflow throws) and so an exact SQL twin
    * exists: h = (h*31 + code(char)) % 1_000_000_007.
    */
  def fingerprintRolling(text: Column): Column =
    fingerprintRollingOfNorm(normalized(text))

  /** Rolling hash over a pre-normalized (materialized) column. */
  def fingerprintRollingOfNorm(norm: Column): Column = {
    val P = 1000000007L
    val h = aggregate(split(norm, ""), lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch).cast("long"), lit(P)))
    when(length(norm) === 0, 0L).otherwise(h)
  }

  private def safeSeq(cnt: Column): Column =
    when(cnt < 1, array().cast("array<int>")).otherwise(sequence(lit(1), cnt))

  /** Lowercased whitespace-collapsed text (the shingle base). */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Character n-grams of the normalized text (shingles for MinHash /
    * Jaccard).
    *
    * PERF: any expression inside a higher-order lambda is re-evaluated
    * per element, so pass an already-materialized (withColumn) norm
    * via `charShinglesOfNorm` in hot paths — handing raw text here
    * re-runs the normalization regex once per shingle position.
    */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfNorm(normalized(text), n)

  /** Bind an expression ONCE as a lambda variable before referencing
    * it inside nested higher-order lambdas: a plain expression used
    * inside a lambda body is re-evaluated per element (subexpression
    * elimination does not reach into higher-order functions), which
    * turns an O(len) pass into O(len²) when the bound value is itself
    * O(len) to compute.
    */
  private def bound(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** Shingles of a pre-normalized column. The norm is bound once, so
    * this is safe to call with a raw expression too (it still costs
    * one extra normalization vs a materialized column — prefer
    * materializing in corpus passes).
    */
  def charShinglesOfNorm(norm: Column, n: Int): Column =
    bound(norm) { nm =>
      val cnt = length(nm) - (n - 1)
      array_distinct(transform(safeSeq(cnt), i => nm.substr(i, lit(n))))
    }

  /** Word n-grams (token shingles). */
  def wordShingles(text: Column, n: Int): Column =
    bound(tokens(lower(text))) { toks =>
      val cnt = size(toks) - (n - 1)
      array_distinct(transform(safeSeq(cnt),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    }

  /** PII patterns for corpus scrubbing: URL first (so emails inside
    * URLs vanish with the URL), then email, then phone. Patterns are
    * deliberately restricted to constructs Java regex and RE2 match
    * identically (character classes + greedy quantifiers, no
    * backtracking-dependent forms) so redaction is engine-portable
    * and auditable in SQL.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"))

  /** Redacted text: every PII match replaced by its tag. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (t, (_, re, tag)) => regexp_replace(t, re, tag) }

  /** Per-kind PII match counts as (url, email, phone) columns.
    * Counted in the same order redaction applies, on the
    * progressively-redacted text, so counts and redaction agree
    * (an email inside a URL counts as URL, not email).
    */
  def piiCounts(text: Column): Seq[Column] = {
    val (cols, _) = PiiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, t), (name, re, tag)) =>
        (acc :+ size(regexp_extract_all(t, lit(re), lit(0))).cast("long").as(s"n_$name"),
          regexp_replace(t, re, tag))
    }
    cols
  }

  /** Intra-document line dedup (the RefinedWeb/Gopher-style "remove
    * repeated lines within a page" cleanup): keeps each line's FIRST
    * occurrence, preserving order — boilerplate headers/footers and
    * templated repetition collapse, prose is untouched. O(lines²)
    * string compares per document (bounded by doc size, never corpus
    * size); the line array is bound once per the lambda rule.
    */
  def dedupLines(text: Column): Column =
    bound(split(text, "\n")) { ls =>
      val idx = when(size(ls) > 0, sequence(lit(0), size(ls) - 1))
        .otherwise(array().cast("array<int>"))
      array_join(
        transform(
          filter(idx, i => !array_contains(slice(ls, lit(1), i), element_at(ls, i + 1))),
          i => element_at(ls, i + 1)),
        "\n")
    }

  /** Fraction of lines that are repeats of an earlier line — the
    * quality signal paired with [[dedupLines]] (high values flag
    * templated/boilerplate documents for filtering rather than
    * cleanup).
    */
  def dupLineFraction(text: Column): Column =
    bound(split(text, "\n")) { ls =>
      val idx = when(size(ls) > 0, sequence(lit(0), size(ls) - 1))
        .otherwise(array().cast("array<int>"))
      val uniq = size(filter(idx, i => !array_contains(slice(ls, lit(1), i), element_at(ls, i + 1))))
      when(size(ls) === 0, 0.0)
        .otherwise((size(ls) - uniq).cast("double") / size(ls).cast("double"))
    }

  /** HTML/markup → text extraction (the trafilatura-shaped step every
    * web-crawl pipeline runs before quality scoring; the reference's
    * extractors only handle pdf/docx/image — web pages are the missing
    * input class at corpus scale). Heuristic, not a DOM parse:
    *   1. drop script/style elements wholesale;
    *   2. block-level closers (</p> </div> </li> </tr> </h*> and <br>)
    *      become newlines so visual structure survives;
    *3+4. every remaining tag → space; entities decoded (&amp; LAST so
    *      double-encoded text is not over-decoded);
    *   5. whitespace normalization: space runs collapse, line edges
    *      trim, blank-line runs collapse.
    * Patterns are restricted to constructs Java regex and RE2 execute
    * identically ((?s)/(?i)/(?m) flags, lazy quantifiers, classes — no
    * backreferences or lookaround), so the whole chain is mirrorable
    * in SQL and the oracle can md5 the result end-to-end.
    */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val breaks = regexp_replace(noBlocks,
      "(?i)<(br|hr)\\s*/?>|</(p|div|li|tr|h[1-6]|ul|ol|table)\\s*>", "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (t, (ent, ch)) =>
      replace(t, lit(ent), lit(ch)) // literal (non-regex), same as SQL replace()
    }
    val oneSpace = regexp_replace(decoded, "[ \\t]+", " ")
    val trimmed = regexp_replace(oneSpace, "(?m)^ +| +$", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), "\n")
  }

  /** <title> contents (first match; "" when absent) — the one piece of
    * head metadata worth keeping from [[stripMarkup]]'s step 1 scope.
    */
  def markupTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union === 0, 0.0).otherwise(inter.cast("double") / union.cast("double"))
  }
}
