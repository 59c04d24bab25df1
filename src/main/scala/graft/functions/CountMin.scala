package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Count-Min sketch as a native typed-buffer aggregate:
  * `cms_estimates(col, probes, depth, width)` returns the total item
  * count and an upper-bound frequency estimate for each probe key, in
  * O(depth × width) memory per group regardless of input cardinality.
  *
  * This is the complementary sketch to Misra-Gries heavy hitters
  * (HeavyHitters.scala): MG answers "which items are frequent", CMS
  * answers "how frequent is THIS item" for any item, without a
  * (item → count) shuffle over the full vocabulary. At 100 TB the
  * exact per-key count of a trillion-token corpus is a billions-of-
  * keys shuffle; the CMS buffer is a fixed 64 KB per group, merged
  * associatively map-side like any partial aggregate.
  *
  * Guarantees (classic CMS, Cormode & Muthukrishnan): estimates never
  * undercount (est ≥ true, always — each row's counter absorbs every
  * occurrence of the key, plus collisions); with width w, the
  * overcount is bounded by ~N/w per row and taking the min across
  * `depth` independent rows makes a large overshoot exponentially
  * unlikely. Both sides are certified at query time in q66: the lower
  * bound must ALWAYS hold, the upper bound within the documented
  * slack.
  */
case class CountMinSketchAgg(
    child: Expression,
    probes: Seq[UTF8String],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketchAgg.Buffer] {

  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 16 && (width & (width - 1)) == 0, s"width must be a power of two: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("ests", ArrayType(LongType))))

  override def createAggregationBuffer(): CountMinSketchAgg.Buffer =
    new CountMinSketchAgg.Buffer(new Array[Long](depth * width), 0L)

  // Per-row position: FNV-1a 64 fingerprint of the key bytes, then a
  // row-keyed 64-bit mix (splitmix64-style finalizer over f + row
  // constant). Internal to the engine — the oracle checks the
  // BOUNDS, never the positions.
  private def fingerprint(key: UTF8String): Long = {
    val b = key.getBytes
    var f = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { f ^= b(i) & 0xffL; f *= 0x100000001b3L; i += 1 }
    f
  }

  @inline private def pos(f: Long, row: Int): Int = {
    var h = f + (row + 1) * 0x9e3779b97f4a7c15L
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    (h & (width - 1)).toInt
  }

  override def update(buf: CountMinSketchAgg.Buffer, input: InternalRow): CountMinSketchAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val f = fingerprint(v.asInstanceOf[UTF8String])
      var r = 0
      while (r < depth) { buf.table(r * width + pos(f, r)) += 1L; r += 1 }
      buf.n += 1L
    }
    buf
  }

  override def merge(buf: CountMinSketchAgg.Buffer, other: CountMinSketchAgg.Buffer): CountMinSketchAgg.Buffer = {
    var i = 0
    while (i < buf.table.length) { buf.table(i) += other.table(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: CountMinSketchAgg.Buffer): Any = {
    val ests = probes.map { p =>
      val f = fingerprint(p)
      var min = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf.table(r * width + pos(f, r))
        if (c < min) min = c
        r += 1
      }
      min
    }
    InternalRow(buf.n, new GenericArrayData(ests.map(Long.box).toArray[Any]))
  }

  override def serialize(buf: CountMinSketchAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.table.length) { out.writeLong(buf.table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketchAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val table = new Array[Long](depth * width)
    var i = 0
    while (i < table.length) { table(i) = in.readLong(); i += 1 }
    new CountMinSketchAgg.Buffer(table, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = cs.head)
}

object CountMinSketchAgg {
  final class Buffer(val table: Array[Long], var n: Long)
}

object CountMin {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimates",
      es => CountMinSketchAgg(
        es.head,
        es(1).eval().asInstanceOf[ArrayData].toArray[UTF8String](StringType).toSeq,
        es(2).eval().asInstanceOf[Int],
        es(3).eval().asInstanceOf[Int]).toAggregateExpression(),
      "scala_udf")

  /** Aggregate column: struct(n, ests) with one estimate per probe,
    * in probe order. Requires register(spark) once per session.
    */
  def cmsEstimates(c: Column, probes: Seq[String], depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    call_function("cms_estimates", c, array(probes.map(lit): _*), lit(depth), lit(width))
  }
}
