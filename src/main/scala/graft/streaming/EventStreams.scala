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
object EventStreams extends Serializable {

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
  case class FunnelState(baseAnchors: List[Long], nFinalized: Long,
                         pending: List[(Long, Long, Int)])
  case class FunnelUpdate(user_id: Long, n_step_events: Long,
                          funnel_stage: Long, converted: Boolean,
                          n_buffered: Long)
  case class LocfState(tsUs: Long, eventId: Long, valueCents: Long, nEvents: Long)
  case class LocfUpdate(user_id: Long, last_ts_us: Long, last_event_id: Long,
                        filled_cents: Long, n_events: Long)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, total_value: Double)
  case class AnomalyState(n: Long, s: Long, q: Long)
  case class AnomalyVerdict(user_id: Long, event_id: Long, n_before: Long,
                            cents: Long, is_anomaly: Boolean)

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

  /** The windowed-funnel anchors fold (Funnel.windowedDepth's state,
    * shared by the live operator): slot k holds the chain-start time
    * of the best chain that has reached step k+1 (−1 = none); `max`
    * keeps folds idempotent under a non-monotone event (an event
    * arriving beyond allowed lateness can never REGRESS an anchor).
    * Left-fold associativity over a sorted prefix is what makes state
    * pruning exact: fold(fold(base, finalized), rest) ==
    * fold(base, finalized ++ rest).
    */
  private def foldAnchors(base: Array[Long], evs: Seq[(Long, Long, Int)],
                          maxSpanUs: Long): Array[Long] = {
    val a = base.clone()
    evs.foreach { case (ts, _, s) =>
      if (s == 1) a(0) = math.max(a(0), ts)
      else if (a(s - 2) >= 0 && ts - a(s - 2) <= maxSpanUs)
        a(s - 1) = math.max(a(s - 1), a(s - 2))
    }
    a
  }

  /** D11 — STREAMING funnel (q73's automaton as live per-user state):
    * every micro-batch emits each touched user's current funnel depth.
    * OUT-OF-ORDER SAFE: state buffers STEP events ((ts_us, event_id,
    * step) triples — non-step events are discarded immediately) and
    * re-folds the sorted buffer on each update, so a late-arriving
    * early 'view' correctly unlocks clicks that arrived before it —
    * arrival order can never change the answer within the allowed
    * lateness (the batch-equivalence spec feeds steps in reverse
    * arrival order to prove it).
    *
    * STATE IS BOUNDED when `lateness` is set: once the event-time
    * watermark (maxEventTime − lateness) passes an event, nothing can
    * arrive before it anymore, so it folds into the O(steps) base
    * anchors array and leaves the buffer — steady-state size is
    * O(steps) + O(events inside the lateness window), flat over an
    * arbitrarily long stream instead of O(all events) (the round-7
    * unbounded-state design note). An event arriving beyond the
    * allowed lateness still folds (best-effort, against the already-
    * finalized base — the max-anchors fold can't regress), matching
    * watermark contracts everywhere else in Structured Streaming.
    * With `lateness` unset the watermark stays 0 and nothing prunes —
    * the exact any-order mode.
    *
    * `maxSpanUs` is the windowFunnel retention bound (chains must
    * complete within it — Funnel.windowedDepth's batch twin);
    * Long.MaxValue gives the unwindowed q73 automaton (greedy ==
    * max-over-chains when the window is infinite).
    */
  def funnelDepth(events: Dataset[Event], steps: Seq[String],
                  maxSpanUs: Long = Long.MaxValue,
                  lateness: Option[String] = None): Dataset[FunnelUpdate] = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.length
    val stepOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap

    def fn(userId: Long, it: Iterator[Event], state: GroupState[FunnelState]): FunnelUpdate = {
      val prev = state.getOption
        .getOrElse(FunnelState(List.fill(nSteps)(-1L), 0L, Nil))
      val incoming = it.flatMap(e =>
        stepOf.get(e.event_type).map(s => (tsMicros(e.ts), e.event_id, s))).toList
      val pending = (prev.pending ++ incoming).sortBy(t => (t._1, t._2))
      val base = prev.baseAnchors.toArray
      val anchors = foldAnchors(base, pending, maxSpanUs)
      val stage = anchors.count(_ >= 0)
      // finalize below the lateness frontier: fold into base, drop
      // (without a watermark the frontier stays 0 — exact mode, no
      // pruning; getCurrentWatermarkMs THROWS when none is set)
      val frontierUs =
        if (lateness.isDefined) state.getCurrentWatermarkMs() * 1000L else 0L
      val (fin, keep) = pending.partition(_._1 < frontierUs)
      state.update(FunnelState(foldAnchors(base, fin, maxSpanUs).toList,
        prev.nFinalized + fin.size, keep))
      FunnelUpdate(userId, prev.nFinalized + pending.size, stage.toLong,
        stage == nSteps, keep.size.toLong)
    }

    lateness.fold(events)(l => events.withWatermark("ts", l))
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

  /** D16 — live per-key anomaly flagging in O(1) state: each event is
    * judged against the distribution of that key's PRIOR events (a
    * k·σ z-test on cent-scaled values), then folded into the state.
    * State is three longs per key — count, Σcents, Σcents² — exact
    * integer moments regardless of stream length, so the derived
    * mean/variance carry no accumulation drift: every double in the
    * flag decision is produced by the same short expression chain the
    * batch twin uses over prefix sums, making streaming ≡ batch
    * bit-for-bit (spec-pinned) rather than approximately.
    *
    * Verdict semantics are HISTORY-SEEN-SO-FAR (arrival order): the
    * judging population is exactly the events that preceded this one
    * into the operator — the live-monitoring contract. Within a
    * micro-batch, events are folded in (ts, event_id) order so a
    * batch's verdicts are deterministic under Spark's unordered group
    * iterator; on an event-time-ordered stream the whole history is
    * therefore event-time-ordered and equals the batch formulation
    * over unbounded-preceding window frames. The first `minN` events
    * of a key are never flagged (no population to judge against).
    */
  def anomalies(events: Dataset[Event], k: Int = 3, minN: Long = 5): Dataset[AnomalyVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._

    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue

    def fn(userId: Long, it: Iterator[Event], state: GroupState[AnomalyState]): Iterator[AnomalyVerdict] = {
      var st = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L))
      val out = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).map { e =>
        val x = cents(e.value)
        val flag = st.n >= minN && {
          val m = st.s.toDouble / st.n
          val variance = st.q.toDouble / st.n - m * m
          val d = x - m
          d * d > (k.toLong * k) * variance
        }
        val v = AnomalyVerdict(userId, e.event_id, st.n, x, flag)
        // sum-of-squares in a Long overflows near |cents| ~ 3e9 (a
        // single $30M value) or very long high-value histories; the
        // batch twin (q106) would wrap silently while the DuckDB
        // oracle sums in HUGEINT — fail fast here instead of
        // diverging silently (supported range: Σx² < 2^63).
        st = AnomalyState(st.n + 1L, Math.addExact(st.s, x),
          Math.addExact(st.q, Math.multiplyExact(x, x)))
        v
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(fn)
  }

  case class TrendState(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long, syy: Long)
  case class TrendUpdate(user_id: Long, n: Long,
                         slope: Option[Double], intercept: Option[Double], r2: Option[Double])

  /** D23 — STREAMING TREND FIT (q127's OLS aggregate as live
    * O(1)-per-key state): the five exact integer moments Σx/Σy/Σxy/
    * Σx²/Σy² accumulate per key — sums are commutative, so state
    * after ANY micro-batch sequence equals the batch moments over
    * the same events EXACTLY, and the derived slope/intercept/r²
    * (the q127 mirrored double chain on Long-exact inputs) match the
    * batch operator bit-for-bit wherever the moments fit a Long
    * (addExact/multiplyExact guard the boundary — fail fast, never
    * silently diverge from the DECIMAL(38) batch twin; x should be
    * centered near its range like the batch contract). Six longs per
    * key forever, no buffer, no watermark dependency — completes the
    * monitoring family: D16 pointwise outliers, D21 accumulated
    * level shifts, D23 the direction and strength of drift itself.
    * x = days since 2024-01-01 of the event time, y = cents.
    */
  def trend(events: Dataset[Event]): Dataset[TrendUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue

    val epochDay0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay

    def fn(userId: Long, it: Iterator[Event], state: GroupState[TrendState]): TrendUpdate = {
      var st = state.getOption.getOrElse(TrendState(0L, 0L, 0L, 0L, 0L, 0L))
      it.foreach { e =>
        val x = tsMicros(e.ts) / 86400000000L - epochDay0
        val y = cents(e.value)
        st = TrendState(st.n + 1L,
          Math.addExact(st.sx, x), Math.addExact(st.sy, y),
          Math.addExact(st.sxy, Math.multiplyExact(x, y)),
          Math.addExact(st.sxx, Math.multiplyExact(x, x)),
          Math.addExact(st.syy, Math.multiplyExact(y, y)))
      }
      state.update(st)
      // derived terms under the same fail-fast overflow contract
      def term(a: Long, b: Long, c: Long, d: Long): Double =
        Math.subtractExact(Math.multiplyExact(a, b), Math.multiplyExact(c, d)).toDouble
      val num = term(st.n, st.sxy, st.sx, st.sy)
      val denx = term(st.n, st.sxx, st.sx, st.sx)
      val deny = term(st.n, st.syy, st.sy, st.sy)
      val slope = if (denx == 0.0) None else Some(num / denx)
      val intercept = slope.map(sl => (st.sy.toDouble - sl * st.sx.toDouble) / st.n.toDouble)
      val r2 =
        if (denx == 0.0 || deny == 0.0) None
        else { val r = num / math.sqrt(denx) / math.sqrt(deny); Some(r * r) }
      TrendUpdate(userId, st.n, slope, intercept, r2)
    }

    events.groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  case class CusumState(sPos: Long, sNeg: Long, n: Long, nAlarms: Long, firstAlarmId: Long)
  case class CusumVerdict(user_id: Long, event_id: Long, s_pos: Long, s_neg: Long,
                          alarm: Boolean, n_alarms: Long)

  /** D21 — STREAMING CUSUM changepoint detection (q128's sequential
    * recurrence as live O(1)-per-key state — where the batch operator
    * runs the prefix CLOSED FORM as one window, the stream runs the
    * textbook recurrence itself; StatsSpec proves the two identical,
    * and the streaming spec pins stream ≡ batch q128 on ordered
    * arrival): per event, S⁺ accumulates upward drift
    * (max(0, S⁺ + x − target − slack)), S⁻ downward, an alarm fires
    * past the decision threshold h, and the FIRST alarm's event id —
    * the detected changepoint — is latched forever. State is five
    * longs per key regardless of stream length (no buffer, no
    * watermark dependency — the D16 contract): history-seen-so-far
    * semantics with within-batch (ts, event_id) fold order for
    * determinism under Spark's unordered group iterator. Overflow
    * guarded with addExact (supported range |Σdev| < 2⁶³), failing
    * fast rather than silently diverging from the integer-exact
    * batch twin.
    */
  def cusum(events: Dataset[Event], targetCents: Long, slackCents: Long,
            h: Long): Dataset[CusumVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._

    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue

    def fn(userId: Long, it: Iterator[Event], state: GroupState[CusumState]): Iterator[CusumVerdict] = {
      var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, -1L))
      val out = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).map { e =>
        val x = cents(e.value)
        val sp = math.max(0L, Math.addExact(st.sPos, x - targetCents - slackCents))
        val sn = math.max(0L, Math.subtractExact(st.sNeg, x - targetCents + slackCents))
        val alarm = sp > h || sn > h
        st = CusumState(sp, sn, st.n + 1L,
          st.nAlarms + (if (alarm) 1L else 0L),
          if (alarm && st.firstAlarmId < 0L) e.event_id else st.firstAlarmId)
        CusumVerdict(userId, e.event_id, sp, sn, alarm, st.nAlarms)
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(fn)
  }
}
