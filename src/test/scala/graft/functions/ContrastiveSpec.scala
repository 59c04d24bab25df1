package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contrastive pair construction — the skip mapping never emits an
  * excluded id, draws stay in range, every anchor gets exactly 1+k
  * rows, and the whole table is a pure function of (corpus, knobs).
  */
class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  private def table(k: Int) =
    Contrastive.pairs(docs, "doc_id", col("doc_id") % 5 === 0 && col("doc_id") < 49L,
      a => a + 1L, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("negatives never collide with the anchor or the positive and stay in range") {
    val rows = table(6)
    rows.filter(_._2 == "negative").foreach { case (a, _, _, o) =>
      assert(o != a && o != a + 1, s"anchor $a drew an excluded id $o")
      assert(o >= 0 && o < 50, s"anchor $a drew out of range: $o")
    }
  }

  test("every anchor gets its positive at rank 0 plus k ranked negatives") {
    val rows = table(4)
    val anchors = (0L until 49L by 5)
    assert(rows.length === anchors.size * 5)
    for (a <- anchors) {
      val mine = rows.filter(_._1 == a).sortBy(_._3)
      assert(mine.head === ((a, "positive", 0L, a + 1)))
      assert(mine.tail.map(_._3).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(mine.tail.forall(_._2 == "negative"))
    }
  }

  test("the skip mapping is exactly uniform over the allowed ids") {
    // brute-check the arithmetic: for every draw d in [0, n-2), the
    // mapped id enumerates [0, n) minus the two excluded, in order
    val n = 10L
    for (a <- Seq(0L, 4L, 8L)) {
      val p = a + 1
      val (e1, e2) = (math.min(a, p), math.max(a, p))
      val mapped = (0L until n - 2).map { d =>
        val s1 = if (d >= e1) d + 1 else d
        if (s1 >= e2) s1 + 1 else s1
      }
      assert(mapped.toSet === ((0L until n).toSet - a - p), s"anchor $a")
      assert(mapped === mapped.sorted, s"anchor $a: order preserved")
    }
  }

  test("a sub-3-document corpus fails loudly, never silent nulls") {
    val tiny = Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text")
    val e = intercept[Exception](
      Contrastive.pairs(tiny, "doc_id", col("doc_id") === 0L, a => a + 1L, 2)
        .collect())
    assert(e.getMessage.contains("need >= 3 documents") ||
      Option(e.getCause).exists(_.getMessage.contains("need >= 3 documents")))
  }

  test("pair construction is partition-invariant") {
    val a = Contrastive.pairs(docs.repartition(1), "doc_id",
      col("doc_id") % 5 === 0 && col("doc_id") < 49L, x => x + 1L, 3)
      .orderBy("anchor_id", "rank").collect().map(_.toSeq).toSeq
    val b = Contrastive.pairs(docs.repartition(7), "doc_id",
      col("doc_id") % 5 === 0 && col("doc_id") < 49L, x => x + 1L, 3)
      .orderBy("anchor_id", "rank").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
