package graft.dedup

import graft.SparkSpec

/** Suffix-array span dedup — hand case with an exactly-sized planted
  * span, brute-force suffix-sort parity, truncation saturation,
  * partition invariance, degenerate inputs.
  */
class SuffixSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 48, minSpan: Int = 20,
                  parts: Int = 3): Map[Long, (Long, Long, Long, Long, Long)] =
    SuffixSpans.docStats(docs.toDF("doc_id", "text").repartition(parts),
      "doc_id", "text", k, minSpan)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  /** Driver-side reference: sort the actual truncated suffixes, take
    * neighbor LCPs, aggregate — the definition the distributed
    * rank/join formulation must match exactly.
    */
  private def reference(docs: Seq[(Long, String)], k: Int, minSpan: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val pos = for ((id, t) <- docs; p <- 1 to t.length)
      yield (id, p, t.substring(p - 1, math.min(p - 1 + k, t.length)))
    val sorted = pos.sortBy(x => (x._3, x._1, x._2))
    def lcp(a: String, b: String): Int = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i
    }
    val n = sorted.size
    val rows = sorted.zipWithIndex.map { case ((id, _, key), r) =>
      val (lp, ip) = if (r == 0) (0, -1L) else (lcp(key, sorted(r - 1)._3), sorted(r - 1)._1)
      val (ln, in2) = if (r == n - 1) (0, -1L) else (lcp(key, sorted(r + 1)._3), sorted(r + 1)._1)
      (id, lp, ip, ln, in2)
    }
    rows.groupBy(_._1).map { case (id, g) =>
      val cp = g.map(x => if (x._3 != id) x._2 else 0)
      val cn = g.map(x => if (x._5 != id) x._4 else 0)
      id -> ((g.size.toLong,
        g.count(x => x._2 >= minSpan || x._4 >= minSpan).toLong,
        g.zipWithIndex.count { case (x, i) => cp(i) >= minSpan || cn(i) >= minSpan }.toLong,
        g.map(x => math.max(x._2, x._4)).max.toLong,
        (cp ++ cn).max.toLong))
    }
  }

  test("hand case: an exactly-25-char cross-doc span flags its 6 qualifying positions") {
    val span = "The quick brown fox jumps" // 25 chars, internally aperiodic
    val docs = Seq(
      (1L, "x" * 30 + span + "q" * 10),
      (2L, "z" * 30 + span + "w" * 10))
    val r = run(docs)
    // suffix at span offset j shares 25 - j chars with its twin:
    // >= 20 for j in 0..5 -> 6 positions per doc
    assert(r(1L)._3 === 6L && r(2L)._3 === 6L, s"cross flags: $r")
    assert(r(1L)._5 === 25L && r(2L)._5 === 25L, "max cross LCP is the span length")
    assert(r === reference(docs, 48, 20))
  }

  test("brute-force suffix-sort parity on noisy docs with planted spans") {
    val rnd = (i: Long) => ('a' + ((i * 17 + 3) % 23).toInt).toChar
    val base = (0L until 6L).map(d =>
      (d, (0L until 80L).map(i => rnd(i * (d + 2) + d)).mkString))
    val docs = base.map { case (d, t) =>
      // plant base(0)'s chars 10..39 into every doc ending in 0 or 3
      if (d % 3 == 0) (d, t + base((d.toInt + 1) % 6)._2.substring(10, 40)) else (d, t)
    }
    assert(run(docs) === reference(docs, 48, 20))
    assert(run(docs, k = 16, minSpan = 8) === reference(docs, 16, 8))
  }

  test("LCP saturates at k for longer duplicates, and they still flag") {
    val span = (0 until 60).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val docs = Seq((1L, "###" + span), (2L, "%%%" + span))
    val r = run(docs, k = 48)
    assert(r(1L)._5 === 48L, "measured LCP saturates at the key width")
    assert(r(1L)._3 > 0L, "the duplicate still flags")
    assert(r === reference(docs, 48, 20))
  }

  test("distinct corpora produce zero cross flags; bit-exact partition invariance") {
    val docs = (0L until 8L).map(d =>
      (d, (0L until 60L).map(i => ('a' + ((i * (d + 3) * 7 + d) % 26).toInt).toChar).mkString))
    val one = run(docs, parts = 1)
    val many = run(docs, parts = 13)
    assert(one === many)
    assert(one === reference(docs, 48, 20))
  }

  test("empty and single-char texts survive") {
    val r = run(Seq((1L, ""), (2L, "a"), (3L, "ab")))
    assert(!r.contains(1L), "empty text has no positions")
    assert(r(2L)._1 === 1L && r(3L)._1 === 2L)
  }

  test("bad span bounds fail fast") {
    intercept[IllegalArgumentException](
      SuffixSpans.docStats(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", k = 10, minSpan = 11))
  }

  // ---- contamination: the cross-corpus exact tier ----

  private def contam(docs: Seq[(Long, String, Boolean)], k: Int = 48, minSpan: Int = 20,
                     parts: Int = 3): Map[Long, (Long, Long, Long)] =
    SuffixSpans.contamination(
      docs.toDF("doc_id", "text", "is_train").repartition(parts),
      "doc_id", "text", "is_train", k, minSpan)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Brute force: every eval position's max LCP over EVERY train
    * position — the O(n·m) definition the nearest-in-rank-order
    * implementation must match exactly.
    */
  private def refContam(docs: Seq[(Long, String, Boolean)], k: Int, minSpan: Int)
      : Map[Long, (Long, Long, Long)] = {
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), k)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    val trainSuf = for ((_, t, tr) <- docs if tr; p <- 0 until t.length) yield t.substring(p)
    docs.filter(!_._3).map { case (id, t, _) =>
      val ls = (0 until t.length).map { p =>
        val s = t.substring(p)
        if (trainSuf.isEmpty) 0 else trainSuf.map(lcp(s, _)).max
      }
      id -> ((t.length.toLong, ls.count(_ >= minSpan).toLong,
        (if (ls.isEmpty) 0 else ls.max).toLong))
    }.toMap
  }

  test("contamination: a planted 25-char train span flags exactly its qualifying positions") {
    val span = "The quick brown fox jumps" // 25 chars
    val docs = Seq(
      (1L, "x" * 30 + span + "q" * 10, true), // train
      (100L, "z" * 8 + span + "w" * 8, false), // eval: contaminated
      (101L, "completely different words here", false)) // eval: clean
    val got = contam(docs)
    assert(got === refContam(docs, 48, 20))
    assert(got(100L)._2 === 6L, s"6 span offsets qualify: $got")
    assert(got(100L)._3 === 25L)
    assert(got(101L)._2 === 0L)
  }

  test("contamination: eval-suffix runs cannot mask a train match (exact, not adjacent)") {
    // many near-identical EVAL docs sort adjacent to each other around
    // the contaminated suffixes; the train twin must still be found
    val core = "shared contamination span!!"
    val docs = Seq((1L, "TRAIN>" + core + "<TRAIN", true)) ++
      (0 until 6).map(i => (200L + i, s"ev$i-" + core + s"-$i", false))
    val got = contam(docs)
    assert(got === refContam(docs, 48, 20))
    (0 until 6).foreach(i => assert(got(200L + i)._2 > 0L, s"eval $i masked"))
  }

  test("contamination: brute parity on noisy corpora across partitionings and key widths") {
    val rnd = (i: Long, s: Long) => ('a' + ((i * 17 + s * 7 + 3) % 23).toInt).toChar
    val docs = (0L until 5L).map(d =>
      (d, (0L until 70L).map(i => rnd(i, d + 2)).mkString, true)) ++
      (0L until 5L).map { d =>
        val t = (0L until 50L).map(i => rnd(i, d + 11)).mkString
        val planted = if (d % 2 == 0)
          t + (0L until 30L).map(i => rnd(i + 10, (d / 2) + 2)).mkString else t
        (300L + d, planted, false)
      }
    assert(contam(docs) === refContam(docs, 48, 20))
    assert(contam(docs, parts = 13) === contam(docs, parts = 1))
    assert(contam(docs, k = 16, minSpan = 8) === refContam(docs, 16, 8))
  }

  test("contamination: no train corpus at all yields zero LCP everywhere") {
    val docs = Seq((1L, "some eval text only here", false))
    val got = contam(docs)
    assert(got(1L)._2 === 0L && got(1L)._3 === 0L)
  }

  test("contamination: disk-spilled gaps are value-identical to in-memory gaps") {
    // gapBufferRows=2 forces every gap longer than two eval suffixes
    // through the spill file (r15 memory-bounding); values must not move
    val rnd = (i: Long, s: Long) => ('a' + ((i * 13 + s * 5 + 1) % 19).toInt).toChar
    val docs = (0L until 3L).map(d =>
      (d, (0L until 40L).map(i => rnd(i, d + 2)).mkString, true)) ++
      (0L until 6L).map { d =>
        val t = (0L until 60L).map(i => rnd(i, d + 9)).mkString
        val planted = if (d % 2 == 0)
          t + (0L until 25L).map(i => rnd(i + 5, (d % 3) + 2)).mkString else t
        (400L + d, planted, false)
      }
    val spilled = SuffixSpans.contamination(
      docs.toDF("doc_id", "text", "is_train").repartition(3),
      "doc_id", "text", "is_train", 48, 20, gapBufferRows = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(spilled === refContam(docs, 48, 20))
    assert(spilled === contam(docs))
  }
}
