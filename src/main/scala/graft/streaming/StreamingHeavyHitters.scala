package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout
import scala.collection.mutable

/** D13 — STREAMING heavy hitters: the Misra-Gries sketch (q34's
  * aggregate tier) as live per-key `mapGroupsWithState` state — the
  * "what's trending per language/domain right now" operator. Each
  * micro-batch folds its tokens into the key's O(k) counter map and
  * emits the current candidate list with the certificate inputs
  * (items seen n, retained mass S).
  *
  * State is O(k) per key FOREVER — the sketch is the state bound, no
  * watermark needed (contrast D11's event buffer): that is exactly
  * why the sketch tier exists at 100 TB, streaming or batch.
  *
  * The emitted guarantees are the Misra-Gries invariants, preserved
  * across arbitrarily many micro-batches because the per-batch fold
  * IS the sequential algorithm continued from the carried state:
  *  - undercount only: a candidate's min_count ≤ its true count;
  *  - bounded miss: any item's (true − counted) ≤ (n − S)/(k+1),
  *    so every item with true count > (n − S)/(k+1) is IN the
  *    candidate list (the superset property the spec asserts);
  *  - candidates are order-dependent between those bounds (standard
  *    MG), so specs must assert the invariants, not buffer equality.
  *
  * Two-phase exact ranking composes downstream exactly as in batch:
  * join the emitted candidate set back to the stream/corpus for
  * exact counts (HeavyHitters.exactTopN's shape).
  */
object StreamingHeavyHitters {

  case class HhItem(item: String, min_count: Long)
  case class HhState(items: List[HhItem], n: Long)
  /** One row per touched key per micro-batch: candidates sorted by
    * (−min_count, item); `retained` = Σ min_count (the S of the
    * certificate); `bound` = the current (n − S)/(k+1) miss bound.
    */
  case class HhUpdate(key: String, n_items: Long, retained: Long,
                      bound: Long, candidates: List[HhItem])

  /** rows: (key, item) pairs, e.g. (lang, token). */
  def sketch(rows: Dataset[(String, String)], k: Int): Dataset[HhUpdate] = {
    require(k >= 1, s"sketch width must be positive: $k")
    val spark = rows.sparkSession
    import spark.implicits._

    def fn(key: String, it: Iterator[(String, String)],
           state: org.apache.spark.sql.streaming.GroupState[HhState]): HhUpdate = {
      val prev = state.getOption.getOrElse(HhState(Nil, 0L))
      val buf = mutable.HashMap.from(prev.items.map(i => i.item -> i.min_count))
      var n = prev.n
      it.foreach { case (_, tok) =>
        n += 1
        buf.get(tok) match {
          case Some(c) => buf.update(tok, c + 1)
          case None if buf.size < k => buf.update(tok, 1L)
          case None => // MG decrement: k+1 mass units leave together
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace { (t, c) => if (c == 1L) dead += t; c - 1L }
            dead.foreach(buf.remove)
        }
      }
      val items = buf.toList.map { case (t, c) => HhItem(t, c) }
        .sortBy(i => (-i.min_count, i.item))
      state.update(HhState(items, n))
      val s = items.map(_.min_count).sum
      HhUpdate(key, n, s, (n - s) / (k + 1), items)
    }

    rows.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
