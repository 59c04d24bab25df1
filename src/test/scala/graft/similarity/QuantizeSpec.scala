package graft.similarity

import graft.SparkSpec

/** Int8 quantization — code bounds, round-trip error, the zero-scale
  * guard, and partition invariance (scales are order-free maxes and
  * codes per-element, so the matrix must not depend on layout).
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, -2.0f, 0.0f, 0.25f)),
    (2L, Array(0.5f, 4.0f, 0.0f, -0.75f)),
    (3L, Array(-1.0f, 1.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("codes stay in int8 range and dequantize within one step of scale") {
    val rows = Quantize.int8Codes(vecs, "vec_id", "embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getAs[Double]("x")
      val scale = r.getAs[Double]("scale")
      val code = r.getAs[Long]("code")
      assert(code >= -128L && code <= 127L, s"code $code out of int8 range")
      if (scale > 0.0) {
        // floor code ⇒ x sits in [code, code+1)·scale/127
        val lo = code * scale / 127.0
        val hi = (code + 1) * scale / 127.0
        assert(x >= lo - 1e-12 && x < hi + 1e-12,
          s"x=$x outside [${lo}, ${hi}) for code=$code scale=$scale")
      } else assert(code === 0L, "zero-scale dimension must code to 0")
    }
  }

  test("max-abs element hits ±127/-128 and the all-zero dim codes to 0") {
    val codes = Quantize.int8Codes(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("dim")) -> r.getAs[Long]("code"))
      .toMap
    assert(codes((2L, 1L)) === 127L) // x = scale exactly ⇒ floor(127.0)
    assert(codes((1L, 1L)) === -64L) // -2/4·127 = -63.5 ⇒ floor = -64
    assert(codes((1L, 2L)) === 0L && codes((2L, 2L)) === 0L)
  }

  test("int8 top-k equals the brute-force integer ranking") {
    val n = 40
    val data = (0L until n).map { i =>
      (i, Array.tabulate(6)(d => ((i * 7 + d * 13) % 19).toFloat - 9f))
    }
    val df = spark.createDataFrame(data).toDF("vec_id", "embedding")
    val out = Quantize.int8TopK(df, "vec_id", "embedding", org.apache.spark.sql.functions.col("id") < 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // brute replay: same scales (max-abs per dim), same floor codes
    val scales = (0 until 6).map(d => data.map(v => math.abs(v._2(d).toDouble)).max)
    def codes(v: Array[Float]): Array[Long] =
      v.zipWithIndex.map { case (x, d) =>
        if (scales(d) == 0.0) 0L else math.floor(x.toDouble * 127.0 / scales(d)).toLong
      }
    val cs = data.map { case (id, v) => id -> codes(v) }.toMap
    for (qid <- 0L until 3L) {
      val ranked = data.map(_._1)
        .map(id => (id, cs(qid).zip(cs(id)).map { case (a, b) => a * b }.sum))
        .sortBy { case (id, s) => (-s, id) }.take(5)
      ranked.zipWithIndex.foreach { case ((id, s), i) =>
        assert(out((qid, i + 1L)) === ((id, s)), s"query $qid rank ${i + 1}")
      }
    }
  }

  test("code vectors have deterministic dim order regardless of partitioning") {
    val a = Quantize.int8Vectors(vecs.repartition(1), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Quantize.int8Vectors(vecs.repartition(5), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
    assert(a(2L)(1) === 127L)
  }

  test("the quantization matrix is partition-invariant") {
    val a = Quantize.int8Stats(vecs.repartition(1), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    val b = Quantize.int8Stats(vecs.repartition(7), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
