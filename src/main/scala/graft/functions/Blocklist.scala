package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern phrase-blocklist matching — the content-filter stage
  * of a corpus pipeline (banned-phrase screening, contamination probe
  * lists, policy filters). One Aho-Corasick automaton pass per
  * document matches EVERY pattern simultaneously: cost is O(text +
  * matches) regardless of pattern count, where the naive per-pattern
  * scan is O(text × patterns) — the gap that matters when the
  * blocklist has thousands of entries and the corpus has 100 TB.
  *
  * Counting semantics (oracle-portable): per pattern, NON-OVERLAPPING
  * occurrences scanning left to right — exactly Java's
  * `indexOf`-stepping and exactly DuckDB's
  * `len(string_split(text, pat)) - 1`, which is what the q93 oracle
  * uses. Patterns are matched independently ("scan" still counts
  * inside a "table scan" match); self-overlaps collapse greedily
  * ("aaaa" contains "aa" twice, not three times).
  *
  * Scale shape: the automaton is built once from the driver-held
  * pattern list and ships inside the task closure — the corpus pass
  * is MAP-ONLY (no join, no broadcast exchange, no shuffle), the q92
  * kernel contract.
  */
object Blocklist {

  /** Phrase list for the q93 driver query (single words + multi-word
    * phrases + nested pattern pairs like "scan" / "table scan" so the
    * suffix-output path of the automaton is exercised on real data).
    */
  val defaultPatterns: Seq[String] = Seq(
    "merge", "window", "table scan", "batch batch", "slow join",
    "spark", "hash", "stream", "fast key", "data row",
    "sort merge", "filter", "query", "big merge", "line join", "dup")

  /** Classic Aho-Corasick: goto trie + BFS failure links + failure-
    * closed output sets. Built eagerly at construction; serializable
    * so one driver-built instance rides the task closure.
    */
  final class Automaton(ps: Seq[String]) extends Serializable {
    require(ps.nonEmpty, "empty pattern list")
    require(ps.forall(_.nonEmpty), "empty pattern")
    require(ps.distinct.size == ps.size, "duplicate patterns")
    val patterns: IndexedSeq[String] = ps.toIndexedSeq

    private val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    for ((p, pi) <- patterns.zipWithIndex) {
      var n = 0
      for (c <- p) n = children(n).getOrElseUpdate(c, {
        children += scala.collection.mutable.HashMap.empty
        ends += Nil
        children.size - 1
      })
      ends(n) = pi :: ends(n)
    }

    private val fail = new Array[Int](children.size)
    // out(n): every pattern ending at n, own matches plus the whole
    // failure chain's — closing the set here keeps the scan loop O(1)
    // per non-matching character.
    private val out: Array[Array[Int]] = {
      val acc = ends.map(_.toArray).toArray
      val q = scala.collection.mutable.Queue.empty[Int]
      for ((_, n) <- children(0)) { fail(n) = 0; q += n }
      while (q.nonEmpty) {
        val n = q.dequeue()
        for ((c, m) <- children(n)) {
          var f = fail(n)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(m) = if (children(f).contains(c) && children(f)(c) != m)
            children(f)(c) else 0
          if (out_ne(acc, fail(m))) acc(m) = acc(m) ++ acc(fail(m))
          q += m
        }
      }
      acc
    }
    private def out_ne(acc: Array[Array[Int]], n: Int) = acc(n).nonEmpty

    /** Per-pattern non-overlapping occurrence counts in one pass.
      * Match end positions arrive in ascending order, so greedy
      * keep-if-disjoint per pattern equals indexOf stepping.
      */
    def nonOverlapCounts(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      val lastEnd = new Array[Int](patterns.length) // exclusive ends
      var n = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (n != 0 && !children(n).contains(c)) n = fail(n)
        n = children(n).getOrElse(c, 0)
        val hits = out(n)
        var h = 0
        while (h < hits.length) {
          val pi = hits(h)
          if (i + 1 - patterns(pi).length >= lastEnd(pi)) {
            counts(pi) += 1
            lastEnd(pi) = i + 1
          }
          h += 1
        }
        i += 1
      }
      counts
    }
  }

  /** Per-document blocklist annotation: total non-overlapping hits,
    * number of distinct patterns present, and the dominant pattern
    * (max count; ties break on the lexicographically smallest
    * pattern; empty string when nothing matched). Text is lowercased
    * before matching; patterns are expected lowercase.
    */
  def annotate(df: DataFrame, idCol: String, textCol: String,
               patterns: Seq[String] = defaultPatterns): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val auto = new Automaton(patterns)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val t = if (text == null) ""
            else text.toLowerCase(java.util.Locale.ROOT)
          val c = auto.nonOverlapCounts(t)
          var total = 0L; var matched = 0L
          var top = ""; var topC = 0L
          var pi = 0
          while (pi < c.length) {
            total += c(pi)
            if (c(pi) > 0) {
              matched += 1
              val p = auto.patterns(pi)
              if (c(pi) > topC || (c(pi) == topC && p < top)) {
                top = p; topC = c(pi)
              }
            }
            pi += 1
          }
          (id, total, matched, top)
        }
      }.toDF(idCol, "total_hits", "n_matched", "top_pattern")
  }
}
