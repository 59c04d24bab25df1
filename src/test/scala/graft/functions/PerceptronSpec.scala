package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-perceptron training (q212/q213): planted-vocabulary
  * separability, partition-order independence of the trained weights
  * (the property that makes the training loop hash-oracleable), the
  * epoch-1 closed form, and empty-doc handling.
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // planted vocab: even docs draw only from GOOD words, odd docs only
  // from BAD words — linearly separable by construction
  private def mkDocs = (0L until 40L).map { i =>
    val words =
      if (i % 2 == 0) Seq("alpha", "beta", "gamma", "delta")
      else Seq("zork", "quux", "blorp", "fnord")
    val text = (0 until 20).map(j => words(((i + j) % 4).toInt)).mkString(" ")
    (i, text, i % 2 == 0)
  }.toDF("doc_id", "text", "label")

  test("separates a planted vocabulary: every positive margin above every negative") {
    val docs = mkDocs
    val m = Perceptron.trainBatch(docs, "doc_id", "text", col("label"),
      buckets = 256, epochs = 3)
    val scored = docs
      .join(Perceptron.score(docs, "doc_id", "text", m), Seq("doc_id"), "left")
      .select(coalesce(col("margin"), lit(0L)).as("m"), col("label"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(pos.min > 0L && neg.max < 0L,
      s"trained margins must separate the planted classes: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("trained weights are partition-order independent") {
    val m1 = Perceptron.trainBatch(mkDocs.repartition(1), "doc_id", "text",
      col("label"), buckets = 256, epochs = 3)
    val m7 = Perceptron.trainBatch(mkDocs.repartition(7), "doc_id", "text",
      col("label"), buckets = 256, epochs = 3)
    assert(m1.weights.toSeq === m7.weights.toSeq,
      "batch updates are order-free integer sums — any divergence breaks the oracle")
  }

  test("epoch 1 from w=0 is the closed form Σ y·n per bucket") {
    val docs = mkDocs
    val m = Perceptron.trainBatch(docs, "doc_id", "text", col("label"),
      buckets = 256, epochs = 1)
    val expected = Dsir.docFeatures(docs, "doc_id", "text", 256)
      .join(docs.select(col("doc_id"),
        when(col("label"), 1L).otherwise(-1L).as("y")), Seq("doc_id"))
      .groupBy("bucket").agg(sum(col("y") * col("n")).as("w"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until 256).foreach { b =>
      assert(m.weights(b) === expected.getOrElse(b, 0L), s"bucket $b")
    }
  }

  test("docs with no tokens score margin 0 and never move the weights") {
    val docs = mkDocs.union(Seq((100L, "   ", true), (101L, "", false))
      .toDF("doc_id", "text", "label"))
    val mEmpty = Perceptron.trainBatch(docs, "doc_id", "text", col("label"),
      buckets = 256, epochs = 2)
    val mBase = Perceptron.trainBatch(mkDocs, "doc_id", "text", col("label"),
      buckets = 256, epochs = 2)
    assert(mEmpty.weights.toSeq === mBase.weights.toSeq,
      "zero-feature docs carry no update mass")
    val scored = Perceptron.score(docs, "doc_id", "text", mEmpty)
      .filter(col("doc_id") >= 100L).collect()
    assert(scored.isEmpty, "featureless docs are absent from score(); callers coalesce to 0")
  }
}
