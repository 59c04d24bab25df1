package graft.streaming

import graft.functions.HllAgg
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D17 — live per-key DISTINCT COUNTS with HyperLogLog state: the
  * streaming face of q103's portable sketch. State per key is the
  * 2^p register array itself; each micro-batch folds its values in
  * through the same hash path the batch aggregate uses, so by HLL's
  * merge-is-union register identity the state after ANY sequence of
  * micro-batches is BIT-IDENTICAL to a batch sketch of the union of
  * all values seen — streaming ≡ batch exactly, not approximately
  * (the estimates agree to the last digit; spec-pinned). That is the
  * property that makes sketch state safe under replays too: folding
  * a value twice is a no-op.
  *
  * O(2^p) state per key forever (the sketch IS the bound — no
  * watermark needed, the D13 Misra-Gries argument), with the
  * estimate and the number of touched registers emitted per update.
  */
object StreamingDistinct {

  case class KeyedValue(key: String, value: String)
  case class DistinctUpdate(key: String, n_events: Long, estimate: Long, registers_used: Long)

  def distinctCounts(values: Dataset[KeyedValue], p: Int = 12): Dataset[DistinctUpdate] = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    val spark = values.sparkSession
    import spark.implicits._

    def fn(key: String, it: Iterator[KeyedValue],
           state: GroupState[(Array[Byte], Long)]): DistinctUpdate = {
      val (regs, n0) = state.getOption.getOrElse((new Array[Byte](1 << p), 0L))
      var n = n0
      it.foreach { kv => HllAgg.add(regs, kv.value, p); n += 1 }
      state.update((regs, n))
      DistinctUpdate(key, n, HllAgg.estimate(regs, p),
        regs.count(_ != 0).toLong)
    }

    values.groupByKey(_.key).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
