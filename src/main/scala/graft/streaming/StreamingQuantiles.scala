package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** D22 — STREAMING QUANTILES over live per-key bottom-k hash-sample
  * state (q130's sketch as a stream): the state per key is the set of
  * ≤ k (hash, id, value) triples with smallest 60-bit md5(id) — and
  * because union-keep-k-smallest is commutative, associative, AND
  * idempotent, the state after ANY micro-batch sequence is
  * SET-IDENTICAL to the batch sample over every event seen so far:
  * streamed p50/p90/p99 equal the batch `QuantileSample.quantiles`
  * to the last cent (spec-pinned across drops), replayed events are
  * no-ops by construction (same id → same triple → same set), and no
  * watermark is needed — the sketch IS the state bound (the D13/D17
  * argument), O(k) per key forever. This is the portability dividend
  * of choosing a set sketch over KLL/t-digest, whose merge-order-
  * dependent compactions could never give this identity.
  */
object StreamingQuantiles extends Serializable {

  case class QuantState(nSeen: Long, items: List[(Long, Long, Long)]) // (hv, id, v), sorted, ≤ k
  case class QuantUpdate(key: String, n_events: Long, m: Long,
                         p50: Long, p90: Long, p99: Long)

  private[streaming] def hash60(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def estimate(sorted: IndexedSeq[Long], p: Int): Long =
    sorted((p * (sorted.length - 1)) / 100)

  /** Live per-event-type cent quantiles from the event stream;
    * `cents` must match the batch twin's rounding (HALF_UP).
    */
  def quantiles(events: Dataset[EventStreams.Event], k: Int = 256): Dataset[QuantUpdate] = {
    require(k >= 1, s"need k >= 1: $k")
    val spark = events.sparkSession
    import spark.implicits._

    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue

    def fn(key: String, it: Iterator[EventStreams.Event],
           state: GroupState[QuantState]): QuantUpdate = {
      val prev = state.getOption.getOrElse(QuantState(0L, Nil))
      var n = prev.nSeen
      val incoming = it.map { e => n += 1; (hash60(e.event_id), e.event_id, cents(e.value)) }
      // set union (id-distinct — replays collapse), keep k smallest
      val merged = (prev.items ++ incoming)
        .groupBy(_._2).map(_._2.head).toList
        .sortBy(t => (t._1, t._2)).take(k)
      state.update(QuantState(n, merged))
      val byValue = merged.map(_._3).sorted.toIndexedSeq
      QuantUpdate(key, n, merged.length.toLong,
        estimate(byValue, 50), estimate(byValue, 90), estimate(byValue, 99))
    }

    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
