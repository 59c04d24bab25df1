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
/** Shared CMS position derivation — one definition so every CMS
  * aggregate (probe estimates, raw-table export) lands identical
  * keys in identical cells, which is what makes independently
  * computed sketches algebraically compatible (mergeable by
  * elementwise add, inner-product-able for join-size estimates).
  */
private[functions] object CmsHash {
  // FNV-1a 64 fingerprint of the key bytes, then a row-keyed 64-bit
  // mix (splitmix64-style finalizer over f + row constant). Internal
  // to the engine — oracles check BOUNDS, never positions.
  def fingerprint(key: UTF8String): Long = {
    val b = key.getBytes
    var f = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { f ^= b(i) & 0xffL; f *= 0x100000001b3L; i += 1 }
    f
  }

  @inline def pos(f: Long, row: Int, width: Int): Int = {
    var h = f + (row + 1) * 0x9e3779b97f4a7c15L
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    (h & (width - 1)).toInt
  }
}

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

  private def fingerprint(key: UTF8String): Long = CmsHash.fingerprint(key)

  @inline private def pos(f: Long, row: Int): Int = CmsHash.pos(f, row, width)

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

/** The same CMS, exported RAW: `cms_table(col, depth, width)` returns
  * struct(n, table[depth·width]) — the counter matrix itself, in row-
  * major order. This is what makes the sketch PORTABLE (persist a
  * corpus's key-frequency summary as one array row; merge later by
  * elementwise add) and COMPOSABLE: the inner product of two tables'
  * matching rows, min'd across rows, is the classic Count-Min
  * JOIN-SIZE estimate (Σ_k f_A(k)·f_B(k); Cormode & Muthukrishnan
  * §4.2) with the same one-sided guarantee as point estimates —
  * never an undercount, overcount ≤ ~N_A·N_B/width per row. Both
  * certified in q104 against the exact join size. Positions come
  * from CmsHash, so tables from either aggregate are compatible.
  */
case class CountMinTableAgg(
    child: Expression,
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
    StructField("table", ArrayType(LongType))))

  override def createAggregationBuffer(): CountMinSketchAgg.Buffer =
    new CountMinSketchAgg.Buffer(new Array[Long](depth * width), 0L)

  override def update(buf: CountMinSketchAgg.Buffer, input: InternalRow): CountMinSketchAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val f = CmsHash.fingerprint(v.asInstanceOf[UTF8String])
      var r = 0
      while (r < depth) { buf.table(r * width + CmsHash.pos(f, r, width)) += 1L; r += 1 }
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

  override def eval(buf: CountMinSketchAgg.Buffer): Any =
    InternalRow(buf.n, new GenericArrayData(buf.table.map(Long.box).toArray[Any]))

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

  override def withNewMutableAggBufferOffset(o: Int): CountMinTableAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinTableAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinTableAgg =
    copy(child = cs.head)
}

object CountMin {

  /** Fold one string occurrence into a row-major depth×width counter
    * table in place — the same CmsHash path the aggregates use, so
    * OTHER state holders (streaming mapGroupsWithState, persisted
    * daily sketches) build tables bit-compatible with query-time
    * aggregation: merge is elementwise add, so streaming state after
    * any micro-batch sequence equals a batch sketch of the same
    * occurrences exactly.
    */
  def add(table: Array[Long], value: String, depth: Int, width: Int): Unit = {
    val f = CmsHash.fingerprint(UTF8String.fromString(value))
    var r = 0
    while (r < depth) { table(r * width + CmsHash.pos(f, r, width)) += 1L; r += 1 }
  }

  /** Min-over-rows point estimate from a raw table. */
  def estimate(table: Array[Long], probe: String, depth: Int, width: Int): Long = {
    val f = CmsHash.fingerprint(UTF8String.fromString(probe))
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = table(r * width + CmsHash.pos(f, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }

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

  def registerTable(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_table",
      es => CountMinTableAgg(
        es.head,
        es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]).toAggregateExpression(),
      "scala_udf")

  /** Aggregate column: struct(n, table) — the raw depth×width counter
    * matrix, row-major. Requires registerTable(spark) once per
    * session.
    */
  def cmsTable(c: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    call_function("cms_table", c, lit(depth), lit(width))
  }

  /** Join-size estimate from two raw tables of identical (depth,
    * width) geometry: min over rows of the per-row inner product —
    * pure column arithmetic (codegen'd higher-order functions), no
    * data leaves the plan.
    */
  def joinSizeEst(tableA: Column, tableB: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
      aggregate(
        zip_with(
          slice(tableA, r * lit(width) + 1, lit(width)),
          slice(tableB, r * lit(width) + 1, lit(width)),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)))
  }
}
