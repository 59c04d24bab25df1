package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a native typed-buffer
  * aggregate: `heavy_hitters(col, k)` returns up to k
  * (item, min_count) candidates containing every item with frequency
  * > n/(k+1), in O(k) memory per group regardless of cardinality.
  *
  * This is the sketch tier of aggregation: an exact top-k of token
  * frequencies over 100 TB needs a full (token → count) shuffle with
  * billions of distinct keys; the sketch buffer is a few KB per
  * group, merged associatively on the combine side like any partial
  * aggregate. Candidates can then be exact-counted with a second
  * cheap pass filtered to the candidate set (the classic two-phase
  * heavy-hitters plan).
  */
case class HeavyHittersSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("min_count", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.mapValuesInPlace { (key, c) =>
      val nc = c - by
      if (nc <= 0) dead += key
      nc
    }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < k) buf.update(key.clone(), 1L)
          else decrementAll(buf, 1L) // MG decrement step
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) => buf.update(key, buf.getOrElse(key, 0L) + c) }
    if (buf.size > k) {
      // keep the k largest; subtract the (k+1)-th count (MG merge)
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      decrementAll(buf, cut)
      // ties at the cut can leave >k entries at 0 already removed;
      // trim any remaining ties deterministically by item order
      if (buf.size > k) {
        val drop = buf.toSeq.sortBy { case (key, c) => (c, key.toString) }
          .take(buf.size - k).map(_._1)
        drop.foreach(buf.remove)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toSeq
      .sortBy { case (key, c) => (-c, key.toString) }
      .map { case (key, c) => InternalRow(key, c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      buf.update(UTF8String.fromBytes(b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHittersSketch =
    copy(child = cs.head)
}

object HeavyHitters {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      es => HeavyHittersSketch(es.head, es(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "scala_udf")

  /** Aggregate column: up to k (item, min_count) heavy-hitter
    * candidates. Requires register(spark) once per session.
    */
  def heavyHitters(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("heavy_hitters", c,
      org.apache.spark.sql.functions.lit(k))
}
