package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) as a
  * native typed-buffer aggregate — the MERGEABLE quantile summary
  * that completes the sketch family (CMS = point frequency, Misra-
  * Gries = heavy hitters, HLL = distinct count, Bloom = membership,
  * MinHash = similarity; THIS = rank/quantile): O(k·log(n/k)) memory
  * per group regardless of input size, buffers merged associatively
  * map-side like any partial aggregate. The exact quantile tier
  * (q46/q109/q130) pays a full range sort per query; the sketch is
  * what a 100 TB profiler keeps PER COLUMN PER DAY and merges across
  * days/shards for ε·n-accurate ranks without ever re-sorting.
  *
  * Structure: a hierarchy of compactors; level h holds items of
  * weight 2^h. When a level overflows its capacity (k·(2/3)^(depth
  * from top), floor 8 — the KLL geometric schedule), it sorts and
  * promotes every other item to the level above (weight doubles,
  * count halves — total weight is conserved exactly, odd sizes leave
  * one item behind). Rank queries walk the weighted items in value
  * order.
  *
  * DETERMINISTIC DEVIATION, documented: the paper draws the
  * survivor offset (odd/even) uniformly per compaction, which makes
  * the estimator unbiased but engine-replays impossible; here the
  * offset alternates with a per-buffer compaction counter. The
  * ε-rank-error bound is preserved (it is a weight-counting
  * argument, not a randomness one); unbiasedness is not. The spec
  * pins the empirical rank error well inside ε on adversarial
  * (sorted/reversed/constant-heavy) inputs. Like Misra-Gries (q34),
  * the result is merge-order-DEPENDENT, so queries certify BOUNDS
  * against the exact tier rather than hashing positions.
  */
object KllAgg {
  final class Buffer(var levels: ArrayBuffer[ArrayBuffer[Long]],
                     var n: Long, var compactions: Long)

  def emptyBuffer(): Buffer =
    new Buffer(ArrayBuffer(ArrayBuffer.empty[Long]), 0L, 0L)

  def capacity(k: Int, h: Int, numLevels: Int): Int = {
    // top level gets k; each level below shrinks by 2/3
    var c = k.toDouble
    var i = numLevels - 1
    while (i > h) { c = c * 2.0 / 3.0; i -= 1 }
    math.max(math.ceil(c).toInt, 8)
  }

  /** Compact any over-capacity level, cascading upward. */
  def compress(buf: Buffer, k: Int): Unit = {
    var h = 0
    while (h < buf.levels.length) {
      if (buf.levels(h).length > capacity(k, h, buf.levels.length)) {
        val lvl = buf.levels(h)
        val sorted = lvl.toArray
        java.util.Arrays.sort(sorted)
        if (h + 1 >= buf.levels.length) buf.levels += ArrayBuffer.empty[Long]
        val off = (buf.compactions & 1L).toInt // deterministic alternation
        buf.compactions += 1
        val even = sorted.length - (sorted.length % 2)
        val keepBehind = sorted.length % 2 == 1
        lvl.clear()
        if (keepBehind) lvl += sorted(sorted.length - 1) // weight conserved
        var i = off
        while (i < even) { buf.levels(h + 1) += sorted(i); i += 2 }
        // re-check this level (now small) and continue upward
      }
      h += 1
    }
  }

  def insert(buf: Buffer, v: Long, k: Int): Unit = {
    buf.levels(0) += v
    buf.n += 1
    compress(buf, k)
  }

  def mergeInto(buf: Buffer, other: Buffer, k: Int): Unit = {
    while (buf.levels.length < other.levels.length) buf.levels += ArrayBuffer.empty[Long]
    var h = 0
    while (h < other.levels.length) { buf.levels(h) ++= other.levels(h); h += 1 }
    buf.n += other.n
    buf.compactions += other.compactions
    compress(buf, k)
  }

  /** Serialized blob form — shared by the aggregate's buffer codec
    * and the persisted sketch store (StreamingSketchStore's KLL arm),
    * so stored blobs merge bit-compatibly with query-time buffers.
    */
  def write(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeLong(buf.compactions)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val compactions = in.readLong()
    val nl = in.readInt()
    val levels = ArrayBuffer.tabulate(nl) { _ =>
      val sz = in.readInt()
      val lvl = new ArrayBuffer[Long](sz)
      var i = 0
      while (i < sz) { lvl += in.readLong(); i += 1 }
      lvl
    }
    if (levels.isEmpty) levels += ArrayBuffer.empty[Long]
    new Buffer(levels, n, compactions)
  }

  /** Estimated value at 0-based rank target (0 ≤ target < n). */
  def valueAtRank(buf: Buffer, target: Long): Long = {
    val items = ArrayBuffer.empty[(Long, Long)] // (value, weight)
    var h = 0
    while (h < buf.levels.length) {
      val w = 1L << h
      buf.levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum > target) return sorted(i)._1
      i += 1
    }
    if (sorted.nonEmpty) sorted.last._1 else 0L
  }
}

/** `kll_quantiles(col, ps_bp, k)`: struct(n, qs) — estimated values
  * at each requested quantile (basis points), target rank
  * (n−1)·p/10000.
  */
case class KllQuantilesAgg(
    child: Expression,
    psBp: Seq[Int],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllAgg.Buffer] {

  require(k >= 16 && k <= 65536, s"k out of range: $k")
  require(psBp.nonEmpty && psBp.forall(p => p >= 0 && p <= 10000), s"bad quantiles: $psBp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("qs", ArrayType(LongType))))

  override def createAggregationBuffer(): KllAgg.Buffer = KllAgg.emptyBuffer()

  override def update(buf: KllAgg.Buffer, input: InternalRow): KllAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) KllAgg.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KllAgg.Buffer, other: KllAgg.Buffer): KllAgg.Buffer = {
    KllAgg.mergeInto(buf, other, k)
    buf
  }

  override def eval(buf: KllAgg.Buffer): Any = {
    val qs = psBp.map { p =>
      if (buf.n == 0) 0L
      else KllAgg.valueAtRank(buf, (buf.n - 1) * p / 10000)
    }
    InternalRow(buf.n, new GenericArrayData(qs.map(Long.box).toArray[Any]))
  }

  override def serialize(buf: KllAgg.Buffer): Array[Byte] = KllAgg.write(buf)

  override def deserialize(bytes: Array[Byte]): KllAgg.Buffer = KllAgg.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = cs.head)
}

object Kll {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles",
      es => KllQuantilesAgg(
        es.head,
        es(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray().toSeq,
        es(2).eval().asInstanceOf[Int]).toAggregateExpression(),
      "scala_udf")

  /** Aggregate column: struct(n, qs) with one estimate per requested
    * basis-point quantile, in request order. Requires register(spark)
    * once per session.
    */
  def kllQuantiles(c: Column, psBp: Seq[Int], k: Int = 200): Column = {
    import org.apache.spark.sql.functions._
    call_function("kll_quantiles", c, array(psBp.map(lit): _*), lit(k))
  }
}
