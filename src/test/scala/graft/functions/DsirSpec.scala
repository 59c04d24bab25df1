package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dsir — hashed-feature construction, bucket-model masses, the exact
  * cross-multiplied score, and top-k selection, each checked against
  * an independent in-test brute-force replay of the definitions.
  */
class DsirSpec extends SparkSpec {

  private val B = 512

  // Independent replay: lowercase whitespace tokens → '1:'/'2:' grams
  // → first-8-hex md5 fold mod B, exactly the published fold every
  // sampling operator here uses.
  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def grams(text: String): Seq[String] = {
    val t = toks(text)
    t.map("1:" + _) ++ t.zip(t.drop(1)).map { case (a, b) => s"2:$a $b" }
  }

  private def bucket(g: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % B
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "quick brown foxes leap over lazy dogs quickly", true),
    (3L, "a slow green turtle walks under the busy bridge", false),
    (4L, "the quick brown fox naps beside the lazy dog", false),
    (5L, "stock markets rallied as bond yields fell sharply", false),
    (6L, "the the the repeated repeated token", false),
    (7L, "quick brown fox", false))

  private def df = {
    val s = spark
    import s.implicits._
    corpus.toDF("doc_id", "text", "tgt").repartition(3)
  }

  test("featureBuckets: unigram+bigram bag with multiplicity") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, "x y x")).toDF("doc_id", "text")
      .select(Dsir.featureBuckets(col("text"), B).as("b"))
      .as[Seq[Long]].head()
    // 3 unigrams + 2 bigrams, in gram order
    val expect = grams("x y x").map(bucket)
    assert(out === expect)
  }

  test("docFeatures: per-doc bucket multiplicity matches the replay") {
    val feats = Dsir.docFeatures(df, "doc_id", "text", B).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = corpus.flatMap { case (id, text, _) =>
      grams(text).map(g => (id, bucket(g)))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(feats === expect)
  }

  test("bucket model masses and totals") {
    val feats = Dsir.docFeatures(df, "doc_id", "text", B)
      .join(df.select(col("doc_id"), col("tgt").as("_tgt")), Seq("doc_id"))
    val model = Dsir.bucketModel(feats, col("_tgt")).collect()
    val expT = corpus.filter(_._3).flatMap(c => grams(c._2).map(bucket))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expR = corpus.filterNot(_._3).flatMap(c => grams(c._2).map(bucket))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    model.foreach { r =>
      val b = r.getLong(r.fieldIndex("bucket"))
      assert(r.getLong(r.fieldIndex("ct")) === expT.getOrElse(b, 0L))
      assert(r.getLong(r.fieldIndex("cr")) === expR.getOrElse(b, 0L))
      assert(r.getLong(r.fieldIndex("nt")) === expT.values.sum)
      assert(r.getLong(r.fieldIndex("nr")) === expR.values.sum)
    }
    assert(model.map(_.getLong(0)).toSet ===
      (expT.keySet ++ expR.keySet))
  }

  test("select: evidence, exact surrogate score, and top-k verdicts") {
    val out = Dsir.select(df, "doc_id", "text", col("tgt"), B, k = 2).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    // brute-force replay
    val ct = corpus.filter(_._3).flatMap(c => grams(c._2).map(bucket))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cr = corpus.filterNot(_._3).flatMap(c => grams(c._2).map(bucket))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val raw = corpus.filterNot(_._3)
    val expect = raw.map { case (id, text, _) =>
      val n = grams(text).map(bucket).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val score = n.map { case (b, m) =>
        BigInt(m) * (BigInt(ct.getOrElse(b, 0L)) * nr - BigInt(cr.getOrElse(b, 0L)) * nt)
      }.sum
      id -> (n.values.sum, n.map { case (b, m) => m * ct.getOrElse(b, 0L) }.sum,
        n.map { case (b, m) => m * cr.getOrElse(b, 0L) }.sum, score)
    }.toMap
    assert(out.keySet === expect.keySet)
    expect.foreach { case (id, (nf, st, sr, sc)) =>
      val r = out(id)
      assert(r.getLong(r.fieldIndex("n_feats")) === nf, s"n_feats doc $id")
      assert(r.getLong(r.fieldIndex("sum_tgt")) === st, s"sum_tgt doc $id")
      assert(r.getLong(r.fieldIndex("sum_raw")) === sr, s"sum_raw doc $id")
      assert(BigInt(r.getDecimal(r.fieldIndex("score")).toBigInteger) === sc,
        s"score doc $id")
    }
    val topIds = expect.toSeq
      .sortBy { case (id, (_, _, _, sc)) => (-sc, id) }.take(2).map(_._1).toSet
    expect.keys.foreach { id =>
      assert(out(id).getBoolean(out(id).fieldIndex("selected")) === topIds(id),
        s"selected doc $id")
    }
  }

  test("selection is partitioning-invariant") {
    val a = Dsir.select(df.repartition(1), "doc_id", "text", col("tgt"), B, k = 3)
      .orderBy("doc_id").collect().map(_.toString)
    val b = Dsir.select(df.repartition(7), "doc_id", "text", col("tgt"), B, k = 3)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
