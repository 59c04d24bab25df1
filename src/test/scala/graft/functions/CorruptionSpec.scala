package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span corruption — structural invariants of the T5 objective: the
  * two streams partition the original tokens, sentinels number spans
  * 0..n−1 and appear pairwise in both streams, runs collapse to one
  * sentinel, order is readable off `ord`, and the whole transform is
  * partition-invariant (the md5 mask makes it a pure function of
  * (doc_id, pos)).
  */
class CorruptionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 30L)
    .map(i => (i, (1 to 40).map(t => s"w${i}_$t").mkString(" ")))
    .toDF("doc_id", "text")

  private lazy val out = Corruption.spanCorrupt(docs, "doc_id", "text", rate = 4)
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

  test("input-kept plus target-masked tokens partition the original stream") {
    val toks = out.filterNot(_._4.startsWith("<extra_id_"))
    for (d <- 0L until 30L) {
      val original = (1 to 40).map(t => s"w${d}_$t")
      val rebuilt = toks.filter(_._1 == d).sortBy(_._3).map(_._4)
      // ord = 2·pos for every real token, in both streams — the union
      // sorted by ord IS the original token stream
      assert(rebuilt.toSeq === original, s"doc $d")
      val kept = toks.filter(r => r._1 == d && r._2 == "input").map(_._3).toSet
      val masked = toks.filter(r => r._1 == d && r._2 == "target").map(_._3).toSet
      assert(kept.intersect(masked).isEmpty, s"doc $d: a token in both streams")
    }
  }

  test("sentinels number spans 0..n-1 and appear identically in both streams") {
    for (d <- 0L until 30L) {
      val sIn = out.filter(r => r._1 == d && r._2 == "input" && r._4.startsWith("<extra_id_"))
        .sortBy(_._3).map(_._4).toSeq
      val sTg = out.filter(r => r._1 == d && r._2 == "target" && r._4.startsWith("<extra_id_"))
        .sortBy(_._3).map(_._4).toSeq
      assert(sIn === sTg, s"doc $d: sentinel streams diverge")
      assert(sIn === sIn.indices.map(i => s"<extra_id_$i>"), s"doc $d: numbering")
    }
  }

  test("a run of masked tokens collapses to ONE sentinel") {
    // masked positions per doc from the target stream; span count
    // from the sentinels; they must satisfy spans = number of runs
    for (d <- 0L until 30L) {
      val maskedPos = out.filter(r => r._1 == d && r._2 == "target" && !r._4.startsWith("<extra_id_"))
        .map(_._3 / 2).sorted.toSeq
      val runs = maskedPos.foldLeft((0, Long.MinValue)) { case ((n, prev), p) =>
        (if (p == prev + 1) n else n + 1, p)
      }._1
      val sentinels = out.count(r => r._1 == d && r._2 == "input" && r._4.startsWith("<extra_id_"))
      assert(sentinels === runs, s"doc $d: $sentinels sentinels for $runs runs")
    }
  }

  test("the transform is partition-invariant and the rate knob masks more") {
    val a = Corruption.spanCorrupt(docs.repartition(1), "doc_id", "text", rate = 4)
      .orderBy("doc_id", "stream", "ord").collect().map(_.toSeq).toSeq
    val b = Corruption.spanCorrupt(docs.repartition(7), "doc_id", "text", rate = 4)
      .orderBy("doc_id", "stream", "ord").collect().map(_.toSeq).toSeq
    assert(a === b)
    def maskedCount(rate: Int): Long =
      Corruption.spanCorrupt(docs, "doc_id", "text", rate)
        .filter(col("stream") === "target" && !col("piece").startsWith("<extra_id_"))
        .count()
    assert(maskedCount(2) > maskedCount(8), "1-in-2 must mask more than 1-in-8")
  }
}
