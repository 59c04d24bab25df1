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

  test("the quantization matrix is partition-invariant") {
    val a = Quantize.int8Stats(vecs.repartition(1), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    val b = Quantize.int8Stats(vecs.repartition(7), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
