package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing + canonicalization for crawl-derived corpora: host /
  * registered-domain extraction feeds per-domain caps (Sampling
  * .domainCap) and domain-level quality priors; canonicalization
  * (tracking-param strip) feeds URL-level exact dedup — two of the
  * standard CommonCrawl curation keys.
  *
  * Built on regexp_extract rather than java.net.URI (no UDF — stays
  * in codegen) and restricted to RE2-compatible patterns so every
  * field is mirrorable in the DuckDB oracle. Malformed URLs yield ""
  * fields, never errors — at crawl scale some fraction of URLs is
  * always junk and a throwing parser is a job-killer.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme ("" when absent). */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** All href targets of `<a>` anchors in normalized markup
    * (double-quoted attributes, lowercase tag/attr — the contract of
    * the stripMarkup synthesis tier): the extraction side of the
    * link graph, whose registered domains feed PageRank. RE2-safe
    * pattern, oracle-mirrorable.
    */
  def anchorHrefs(html: Column): Column =
    regexp_extract_all(html, lit("<a [^>]*href=\"([^\"]*)\""), lit(1))

  /** Lowercased host: after scheme and optional userinfo, up to the
    * first of port / path / query / fragment.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, SchemeRe + "(?:[^/?#@]*@)?([^/:?#]+)", 2))

  /** Path including the leading slash ("" for a bare host). */
  def path(url: Column): Column =
    regexp_extract(url, SchemeRe + "[^/?#]*(/[^?#]*)", 2)

  /** Query string without the '?' ("" when absent). */
  def query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Number of non-empty path segments. */
  def pathDepth(url: Column): Column =
    size(filter(split(path(url), "/"), s => length(s) > 0)).cast("long")

  /** Registered domain via the multi-part-TLD heuristic: when the
    * second-to-last label is a known second-level registry label
    * (co/com/org/net/ac/gov, as in co.uk / com.au) and the host has
    * ≥3 labels, keep three labels, else two. A full public-suffix
    * list is a broadcast lookup-table join in production; the
    * heuristic covers the common registries without the table.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    // get() (0-based) returns null out-of-bounds; element_at's
    // negative indexing THROWS on short arrays under ANSI mode
    // (Spark 4 default) even on rows the when() guards route away.
    val last = get(labels, n - 1)
    val sld = get(labels, n - 2)
    val third = get(labels, n - 3)
    when(n >= 3 && sld.isin("co", "com", "org", "net", "ac", "gov"),
      concat_ws(".", third, sld, last))
      .when(n >= 2, concat_ws(".", sld, last))
      .otherwise(h)
  }

  /** Canonical URL for exact dedup: lowercased scheme+host, path as-is,
    * query with tracking parameters (utm_*, gclid, fbclid, ref)
    * removed and the '?' dropped when nothing survives. Fragments are
    * always dropped (pure client-side state).
    */
  def canonicalize(url: Column): Column = {
    val keptQuery = array_join(
      filter(split(query(url), "&"),
        p => !p.rlike("^(utm_[a-z]+|gclid|fbclid|ref)=") && length(p) > 0),
      "&")
    concat(scheme(url), lit("://"), host(url), path(url),
      when(length(keptQuery) > 0, concat(lit("?"), keptQuery)).otherwise(lit("")))
  }
}
