package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C118 — margin-based bitext mining: planted translation twins must
  * mine with selected = true, distractor-only sources must fail the
  * margin (the method's whole point: absolute closeness is not
  * enough), and the chain is partition-invariant.
  */
class BitextMiningSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  // deterministic anchor per pair index — well-separated directions
  private def anchor(i: Int): Array[Float] =
    Array.tabulate(Dim)(d => (((i * 7 + d * 13) % 19) - 9) / 10.0f +
      (if (d == (i * 5) % Dim) 3.0f else 0f))

  // en docs 0..3 at anchors with de twins 100..103 (tiny nudge); de
  // docs 200..205 form a DENSE CLUSTER (jitters of one far anchor),
  // and en 4..7 sit INSIDE that cluster — their best de candidate is
  // absolutely CLOSE but no closer than the rest of the cluster, so
  // the margin must reject it. This is the method's defining
  // behavior: an absolute threshold would accept those pairs, the
  // neighborhood-relative margin does not (Artetxe & Schwenk §3).
  private lazy val docs = {
    val en = (0 to 3).map(i => (i.toLong, "en", anchor(i).toSeq)) ++
      (4 to 7).map(i => (i.toLong, "en",
        anchor(40).zipWithIndex.map { case (x, d) => x + (if (d == 10 + i) 0.03f else 0f) }.toSeq))
    val twins = (0 to 3).map(i => (100L + i, "de",
      anchor(i).zipWithIndex.map { case (x, d) => x + (if (d == i) 0.02f else 0f) }.toSeq))
    val cluster = (0 to 5).map(j => (200L + j, "de",
      anchor(40).zipWithIndex.map { case (x, d) => x + (if (d == j) 0.03f else 0f) }.toSeq))
    (en ++ twins ++ cluster).toDF("doc_id", "lang", "embedding")
  }

  private lazy val model =
    IvfIndex.trainCentroidsQuantized(docs, Dim, nCentroids = 2,
      idCol = "doc_id", vecCol = "embedding")

  test("planted twins mine with selected = true; twinless sources fail the margin") {
    val mined = BitextMining.minePairs(docs, model, "en", "de",
      idCol = "doc_id", grpCol = "lang", vecCol = "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(5)))).toMap
    (0 to 3).foreach { i =>
      val (tgt, dist, sel) = mined(i.toLong)
      assert(tgt === 100L + i, s"en $i must pair with its twin, got $tgt")
      assert(sel, s"twin pair $i must clear the margin (dist $dist)")
    }
    (4 to 7).foreach { i =>
      mined.get(i.toLong).foreach { case (_, _, sel) =>
        assert(!sel, s"twinless en $i must fail the margin")
      }
    }
  }

  test("mining is partition-invariant") {
    def run(parts: Int) = BitextMining.minePairs(
      docs.repartition(parts), model, "en", "de",
      idCol = "doc_id", grpCol = "lang", vecCol = "embedding")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(run(1) === run(7))
  }

  test("outputs carry the exact integer evidence (no float columns)") {
    val mined = BitextMining.minePairs(docs, model, "en", "de",
      idCol = "doc_id", grpCol = "lang", vecCol = "embedding")
    val types = mined.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("dist") === "bigint" && types("nn_sum") === "bigint" &&
      types("nn_n") === "bigint" && types("selected") === "boolean")
    // margin identity re-checked row by row from the evidence columns
    mined.collect().foreach { r =>
      val expect = r.getLong(2) * r.getLong(3) * 105 < r.getLong(4) * 100
      assert(r.getBoolean(5) === expect, s"selected must equal the margin identity: $r")
    }
  }
}
