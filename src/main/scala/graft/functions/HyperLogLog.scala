package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native typed-buffer
  * aggregate: `hll_distinct(col, p)` estimates the number of distinct
  * values in 2^p bytes per group, merged associatively map-side like
  * any partial aggregate.
  *
  * Spark ships approx_count_distinct (also HLL-based), but its sketch
  * is an opaque internal buffer: it cannot be persisted, unioned
  * across independently-computed partitions-of-history, or diffed.
  * This implementation is PORTABLE in the PortableBloom sense — the
  * register array layout (byte j = max rank seen for substream j) is
  * documented, stable, and merge = elementwise max, so daily sketches
  * can be stored as 4 KB blobs and unioned months later, the
  * incremental-ingest counterpart of q54's signature index. That
  * union is EXACT sketch algebra, not an approximation of one:
  * HLL(A) merge HLL(B) is register-identical to HLL(A ∪ B) (max is
  * associative/commutative/idempotent per substream) — spec-pinned,
  * and the reason sketch-merge pipelines compose safely at any
  * fan-in.
  *
  * Estimator: classic Flajolet et al. HLL with the standard small-
  * range linear-counting correction (no large-range correction — the
  * 64-bit hash space makes collisions irrelevant below ~2^57).
  * Deterministic: FNV-1a 64 fingerprint + splitmix64 finalizer (a
  * different mix constant than CountMin's row mix), low p bits pick
  * the register, rank = leading zeros of the remaining bits + 1. The
  * relative error concentrates at ~1.04/√m; query-time certificates
  * (q103) assert |est − exact| against a 5σ-slack bound the oracle
  * re-derives from exact counts — the estimate itself is
  * deterministic given the data, the bound is the portable contract.
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def hash(key: UTF8String): Long = HllAgg.hashBytes(key.getBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash(v.asInstanceOf[UTF8String])
      val j = (h & (m - 1)).toInt
      val w = h >>> p
      val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w) - p) + 1
      if (rank > (buf(j) & 0xff)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if ((other(j) & 0xff) > (buf(j) & 0xff)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = HllAgg.estimate(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllAgg =
    copy(child = cs.head)
}

object HllAgg {

  /** Fold one string value into a register array in place — the same
    * hash/rank path the aggregate uses, exposed so OTHER state
    * holders (streaming mapGroupsWithState, persisted daily sketches)
    * build registers that are bit-compatible with query-time
    * aggregation: merge-is-union then makes streaming state ≡ a
    * batch sketch of the same values, exactly.
    */
  def add(registers: Array[Byte], value: String, p: Int): Unit = {
    val h = hashString(value)
    val m = 1 << p
    val j = (h & (m - 1)).toInt
    val w = h >>> p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w) - p) + 1
    if (rank > (registers(j) & 0xff)) registers(j) = rank.toByte
  }

  private def hashString(value: String): Long =
    hashBytes(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // FNV-1a 64 + splitmix64 finalizer (decorrelates FNV's weak low bits)
  private[functions] def hashBytes(b: Array[Byte]): Long = {
    var f = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { f ^= b(i) & 0xffL; f *= 0x100000001b3L; i += 1 }
    f += 0x9e3779b97f4a7c15L
    f = (f ^ (f >>> 30)) * 0xbf58476d1ce4e5b9L
    f = (f ^ (f >>> 27)) * 0x94d049bb133111ebL
    f ^ (f >>> 31)
  }

  /** Estimate from a register array — exposed so persisted sketches
    * can be evaluated (and unioned: elementwise max) outside a query.
    */
  def estimate(registers: Array[Byte], p: Int): Long = {
    val m = 1 << p
    require(registers.length == m, s"expected $m registers, got ${registers.length}")
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = registers(j) & 0xff
      sum += 1.0 / java.lang.Math.scalb(1.0, r)
      if (r == 0) zeros += 1
      j += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    math.rint(e).toLong
  }
}

object HyperLogLog {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct",
      es => HllAgg(es.head, es(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "scala_udf")

  /** Aggregate column: estimated distinct count of `c` with 2^p
    * registers. Requires register(spark) once per session.
    */
  def hllDistinct(c: Column, p: Int): Column = {
    import org.apache.spark.sql.functions._
    call_function("hll_distinct", c, lit(p))
  }
}
