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

  /** Two-phase EXACT top-N items per group: a Misra-Gries sketch pass
    * (O(k) buffer per group) produces a candidate superset; a second
    * pass exact-counts ONLY the candidates (the broadcast join keeps
    * the count shuffle to ≤ groups×k keys, never the full vocabulary)
    * and ranks the true top N.
    *
    * The output is certified AT RUNTIME via the Misra-Gries mass
    * bound: with n items processed and S = Σ min_count retained in
    * the sketch, every absent item's true count is ≤ (n−S)/(k+1)
    * (each decrement event removes k+1 units of mass; the bound is
    * preserved by the mergeable-summaries merge). The query
    * raise_error()s — instead of silently returning a wrong top-N —
    * when either certificate fails:
    *  1. the sketch returned < N candidates while decrements occurred
    *     (n > S): the missing ranks could belong to evicted items
    *     (closes the round-4 "sparse sketch skips the guard" blind
    *     spot — checked on the candidate side, before ranking, so it
    *     fires even when no rank-N row exists);
    *  2. the exact rank-N count is ≤ (n−S)/(k+1): an absent item
    *     could displace rank N.
    * When n == S the sketch provably saw no eviction, the candidate
    * set is the complete vocabulary, and both certificates pass by
    * construction. On failure: raise k or fall back to exact
    * counting.
    */
  def exactTopN(toks: org.apache.spark.sql.DataFrame, groupCol: String, itemCol: String,
                k: Int = 32, topN: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= topN, s"sketch width k=$k must be >= topN=$topN")
    register(toks.sparkSession)
    val sketch = toks.groupBy(groupCol)
      .agg(heavyHitters(col(itemCol), k).as("hh"), count(lit(1)).as("_n"))
    // explode_outer keeps groups whose sketch drained to empty (all
    // counters decremented away) so certificate 1 still fires for them
    val cand = sketch.select(col(groupCol), col("_n"),
        size(col("hh")).cast("long").as("_ncand"),
        aggregate(col("hh.min_count"), lit(0L), (a, x) => a + x).as("_s"),
        explode_outer(col("hh.item")).as(itemCol))
      .filter(
        when(col("_n") > col("_s") && col("_ncand") < lit(topN.toLong),
          raise_error(format_string(
            s"heavy-hitters: sketch holds %d < $topN candidates for $groupCol=%s " +
              "with evictions (n=%d, retained mass=%d) — missing ranks cannot be " +
              "certified; raise sketch k or fall back to exact counting",
            col("_ncand"), col(groupCol), col("_n"), col("_s"))).cast("boolean"))
          .otherwise(lit(true)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("cnt").desc, col(itemCol))
    toks.join(broadcast(cand), Seq(groupCol, itemCol))
      .groupBy(col(groupCol), col(itemCol), col("_n"), col("_ncand"), col("_s"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topN)
      .filter(
        when(col("rk") === topN && col("cnt") * (k + 1) <= col("_n") - col("_s"),
          raise_error(format_string(
            s"heavy-hitters top-$topN guarantee violated for $groupCol=%s: rank-$topN " +
              s"count %d <= (n - retained)/(k+1) bound of (%d - %d)/${k + 1} — an evicted " +
              "item could displace it; raise sketch k or fall back to exact counting",
            col(groupCol), col("cnt"), col("_n"), col("_s"))).cast("boolean"))
          .otherwise(lit(true)))
      .select(col(groupCol), col("rk"), col(itemCol).as("item"), col("cnt"))
  }

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
