package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Batch DataFrames share the same transformations (the q17 batch
  * twin in SparkEntry runs the same tumbling-window agg), which is
  * the point: one declarative plan, micro-batch or batch execution.
  *
  * Scale: windowed aggs shuffle on (window, key) with partial
  * aggregation; watermarks bound state. Sessionization state is
  * per-user and GC'd by the processing-time timeout.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark bounding
    * late data and state size.
    */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-stream INTERVAL JOIN: each click joins the same user's
    * purchases landing within `maxDelay` after it. Both sides carry
    * watermarks, and the join condition is equi-key + a bounded
    * time range — exactly the shape Structured Streaming requires to
    * bound join state (click state expires once the purchase-side
    * watermark passes click.ts + maxDelay; purchase state
    * symmetrically). Works identically on batch DataFrames, which the
    * equivalence spec asserts against a plain inequality join.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        watermark: String = "2 hours",
                        maxDelay: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $maxDelay"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Streaming exact dedup on event_id within the watermark. */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class FunnelState(stepEvents: List[(Long, Long, Int)])
  case class FunnelUpdate(user_id: Long, n_step_events: Long,
                          funnel_stage: Long, converted: Boolean)
  case class LocfState(tsUs: Long, eventId: Long, valueCents: Long, nEvents: Long)
  case class LocfUpdate(user_id: Long, last_ts_us: Long, last_event_id: Long,
                        filled_cents: Long, n_events: Long)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Timestamp ↔ epoch-microseconds, exact: `Timestamp.getTime` alone
    * is millisecond-truncated, which would make streaming session
    * boundaries diverge from the µs-exact batch twin (q35) on any
    * event with a sub-millisecond component — caught by
    * StreamBatchEquivalenceSpec.
    */
  private def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes after `gapMs` of user inactivity — either when the user's
    * next event arrives past the gap, or when the event-time watermark
    * passes lastSeen+gap (idle flush). Event-time timeouts keep the
    * operator deterministic and replayable (a processing-time timeout
    * would tie results to wall-clock and forces continuous empty
    * micro-batches). State tracks event time in MICROSECONDS so the
    * emitted boundaries equal the batch sessionizer's bit-for-bit.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => tsMicros(e.ts))
      var out = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = tsMicros(e.ts)
        cur match {
          case Some(s) if t - s.lastSeen <= gapUs =>
            cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value))
          case Some(s) =>
            out ::= Session(userId, microsTs(s.start),
              microsTs(s.lastSeen), s.nEvents, s.totalValue)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach { s =>
          out ::= Session(userId, microsTs(s.start),
            microsTs(s.lastSeen), s.nEvents, s.totalValue)
        }
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          // timeout API is millisecond-based; round the µs deadline UP
          // so a timeout never fires before the gap has truly elapsed
          state.setTimeoutTimestamp(
            math.max(Math.floorDiv(s.lastSeen + gapUs + 999L, 1000L),
              state.getCurrentWatermarkMs() + 1))
        }
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** D11 — STREAMING funnel (q73's automaton as live per-user state):
    * every micro-batch emits each touched user's current funnel depth.
    * OUT-OF-ORDER SAFE without a watermark ordering requirement: the
    * state keeps every STEP event seen so far ((ts_us, event_id,
    * step) triples — non-step events are discarded immediately, which
    * is the state bound) and the automaton re-folds the sorted list
    * on each update, so a late-arriving early 'view' correctly
    * unlocks clicks that arrived before it — arrival order can never
    * change the answer (the batch-equivalence spec feeds steps in
    * reverse arrival order to prove it). At scale, step events below
    * the watermark are final and can be folded into a (stage,
    * frontier) prefix to truncate state; kept whole here for exact
    * any-order semantics.
    */
  def funnelDepth(events: Dataset[Event], steps: Seq[String]): Dataset[FunnelUpdate] = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap

    def fn(userId: Long, it: Iterator[Event], state: GroupState[FunnelState]): FunnelUpdate = {
      val incoming = it.flatMap(e =>
        stepOf.get(e.event_type).map(s => (tsMicros(e.ts), e.event_id, s))).toList
      val all = (state.getOption.map(_.stepEvents).getOrElse(Nil) ++ incoming)
        .sortBy(t => (t._1, t._2))
      var stage = 0
      all.foreach { case (_, _, s) => if (s == stage + 1) stage += 1 }
      state.update(FunnelState(all))
      FunnelUpdate(userId, all.size.toLong, stage.toLong, stage == steps.length)
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** D12 — streaming LOCF FRONTIER (the live half of q78's gap-fill):
    * per-key "last known value" state, updated each micro-batch and
    * emitted as the current fill frontier — what a serving layer
    * reads while the batch gap-fill materializes dense historical
    * spines. OUT-OF-ORDER SAFE by construction: the state keeps the
    * event-time-MAX (ts, event_id) observation, a pure max under the
    * same total order as the batch operator's within-day tie pick, so
    * a late-arriving older event can never overwrite a newer value.
    * O(1) state per key — no buffering, no watermark dependency.
    */
  def locfFrontier(events: Dataset[Event]): Dataset[LocfUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(userId: Long, it: Iterator[Event], state: GroupState[LocfState]): LocfUpdate = {
      var cur = state.getOption.getOrElse(LocfState(Long.MinValue, Long.MinValue, 0L, 0L))
      var n = cur.nEvents
      it.foreach { e =>
        val t = tsMicros(e.ts)
        n += 1
        if (t > cur.tsUs || (t == cur.tsUs && e.event_id > cur.eventId))
          // cents encoding must equal the batch path's Spark round(v*100)
          // — HALF_UP away from zero on the double's decimal repr;
          // math.round is half-toward-positive and disagrees on
          // negative half-cents (e.g. -0.005)
          cur = LocfState(t, e.event_id,
            BigDecimal(e.value * 100)
              .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue, n)
      }
      cur = cur.copy(nEvents = n)
      state.update(cur)
      LocfUpdate(userId, cur.tsUs, cur.eventId, cur.valueCents, n)
    }

    events.groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
