package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SetSimJoin: exactness vs in-memory brute force, threshold edges,
  * the fail-fast prefix-bucket guard, and partition invariance.
  *
  * Corpus-construction note (see the round-8 lesson in SURVEY §12):
  * the doc id is embedded in every filler word, so unrelated docs
  * share no word 3-grams by construction — overlap exists only where
  * planted.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def gram3(text: String): Set[String] = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], num: Int, den: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => (id, gram3(t)) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size.toLong
      if i * den >= (sa.size + sb.size - i) * num
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, i)).toSet
  }

  // 30 base docs of id-salted words (zero cross-doc 3-gram overlap),
  // plus planted structure: 100/101 near-dup of 0 (one-word edits at
  // different depths), 102 an exact dup of 1, 103 a half-overlap of 2.
  private lazy val corpus: Seq[(Long, String)] = {
    def words(id: Long, n: Int): String = (0 until n).map(k => s"w${id}x$k").mkString(" ")
    val base = (0L until 30L).map(id => (id, words(id, 12 + (id % 5).toInt)))
    val d0 = base(0)._2
    val edited = d0.split(" ").updated(11, "changed").mkString(" ")
    val edited2 = d0.split(" ").updated(5, "swapped").mkString(" ")
    val half = base(2)._2.split(" ").take(7).mkString(" ") + " " + words(900, 5)
    base ++ Seq((100L, edited), (101L, edited2), (102L, base(1)._2), (103L, half))
  }

  private def run(docs: Seq[(Long, String)], num: Int, den: Int,
      guard: Option[Int] = None): Seq[(Long, Long, Long, Long, Long, Double)] = {
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    SetSimJoin.join(df, "doc_id", "sh", num, den, guard)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
  }

  test("matches brute force exactly at tau=1/2") {
    val got = run(corpus, 1, 2)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == brute(corpus, 1, 2))
    // the planted structure is actually in the answer
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((0L, 100L)) && pairs.contains((1L, 102L)))
    assert(got.forall(r => r._1 < r._2))
    // jaccard is exactly inter/union
    got.foreach(r => assert(r._6 == r._5.toDouble / (r._3 + r._4 - r._5)))
  }

  test("matches brute force at tau=1 (exact duplicates only)") {
    val got = run(corpus, 1, 1)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == brute(corpus, 1, 1))
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 102L)))
  }

  test("a low tau still matches brute force (half-overlap doc crosses in)") {
    val got = run(corpus, 1, 4)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == brute(corpus, 1, 4))
    assert(got.map(r => (r._1, r._2)).toSet.contains((2L, 103L)))
  }

  test("empty and sub-3-token docs are excluded, never paired") {
    val docs = corpus ++ Seq((200L, ""), (201L, "   "), (202L, "two words"))
    val got = run(docs, 1, 2)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == brute(docs, 1, 2))
    assert(!got.exists(r => r._1 >= 200L || r._2 >= 200L))
  }

  test("prefix-bucket guard fails fast on a hot bucket, passes when sized") {
    val clones = (0L until 6L).map(id => (id, corpus.head._2)) // 6 identical docs
    // plan-folded raise_error surfaces wrapped in the job failure —
    // walk the cause chain for the guard's message
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val e = intercept[Exception](run(clones, 1, 2, guard = Some(3)))
    assert(chain(e).contains("prefix bucket"))
    assert(run(clones, 1, 2, guard = Some(6)).size == 15) // all C(6,2) pairs
  }

  test("result is partition-invariant") {
    val df = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val one = SetSimJoin.join(df.repartition(1), "doc_id", "sh", 1, 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val many = SetSimJoin.join(df.repartition(7), "doc_id", "sh", 1, 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(one == many && one.nonEmpty)
  }
}
