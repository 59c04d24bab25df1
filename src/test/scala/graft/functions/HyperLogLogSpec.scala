package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog: merge-is-union register identity, accuracy bands,
  * linear-counting small range, determinism/partition invariance,
  * and the persisted-sketch evaluation path.
  */
class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private val P = 12

  private def sketch(values: Seq[String]): Array[Byte] = {
    val agg = HllAgg(BoundReference(0, StringType, nullable = true), P)
    val buf = agg.createAggregationBuffer()
    values.foreach(v => agg.update(buf, InternalRow(UTF8String.fromString(v))))
    buf
  }

  test("merge(HLL(A), HLL(B)) is register-identical to HLL(A ++ B)") {
    val a = (0 until 5000).map(i => s"a$i")
    val b = (0 until 5000).map(i => s"b$i")
    val agg = HllAgg(BoundReference(0, StringType, nullable = true), P)
    val merged = agg.merge(sketch(a), sketch(b))
    assert(merged.toSeq == sketch(a ++ b).toSeq)
    // idempotent under overlap too
    val overlap = agg.merge(sketch(a), sketch(a ++ b))
    assert(overlap.toSeq == sketch(a ++ b).toSeq)
  }

  test("estimate within 5 sigma across cardinality decades") {
    val sigma = 1.04 / math.sqrt(1 << P)
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val est = HllAgg.estimate(sketch((0 until n).map(i => s"v$i")), P)
      assert(math.abs(est - n) <= math.max(5 * sigma * n, 3),
        s"n=$n est=$est outside 5 sigma")
    }
  }

  test("small range hits linear counting and is near-exact") {
    val est = HllAgg.estimate(sketch((0 until 10).map(i => s"x$i")), P)
    assert(est == 10L)
    assert(HllAgg.estimate(new Array[Byte](1 << P), P) == 0L)
  }

  test("duplicates never move the estimate; serialization is the raw registers") {
    val vals = (0 until 1000).map(i => s"d$i")
    val once = sketch(vals)
    val thrice = sketch(vals ++ vals ++ vals)
    assert(once.toSeq == thrice.toSeq)
    val agg = HllAgg(BoundReference(0, StringType, nullable = true), P)
    assert(agg.deserialize(agg.serialize(once)).toSeq == once.toSeq)
    intercept[IllegalArgumentException](HllAgg.estimate(new Array[Byte](7), P))
  }

  test("dataframe aggregate is partition-invariant and skips nulls") {
    HyperLogLog.register(spark)
    val df = ((0 until 2000).map(i => Some(s"t${i % 500}")) :+ None).toDF("v")
    val est1 = df.repartition(1).agg(HyperLogLog.hllDistinct(col("v"), P)).head().getLong(0)
    val est8 = df.repartition(8).agg(HyperLogLog.hllDistinct(col("v"), P)).head().getLong(0)
    assert(est1 == est8)
    assert(math.abs(est1 - 500) <= 5 * 1.04 / math.sqrt(1 << P) * 500)
  }
}
