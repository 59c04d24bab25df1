package graft.streaming

import graft.operators.SequenceMatch
import graft.operators.SequenceMatch.Step
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** D20 — STREAMING row-pattern matching (q124's MATCH_RECOGNIZE
  * automaton as live per-key state): every micro-batch emits each
  * touched key's current match counts under EXACTLY the batch
  * operator's semantics — (ts, event_id) scan order, per-attempt
  * longest match, AFTER MATCH SKIP PAST LAST ROW.
  *
  * OUT-OF-ORDER SAFE the D11 way: state buffers (ts_us, event_id,
  * symbol) triples (non-pattern symbols included — they can break a
  * match) and re-scans the sorted buffer each update, so a
  * late-arriving early event re-segments matches that already
  * appeared tentatively. Counts split into:
  *
  *  - `n_final` — matches RESOLVED below the allowed-lateness
  *    frontier via [[SequenceMatch.resolveCut]]: the attempt's NFA
  *    died strictly inside the immutable prefix, so no future arrival
  *    (insertions land at or above the frontier; appends only extend
  *    the tail) can revive, extend, or re-segment them. Final counts
  *    are MONOTONE — they never decrease and never change meaning.
  *  - `n_tentative` — matches visible in the live buffer beyond the
  *    resolved cut; these can still grow (longest match), merge, or
  *    split as late events land inside the lateness window.
  *
  * `n_final + n_tentative` equals the batch `SequenceMatch.matches`
  * count over every event seen so far (spec-pinned across arbitrary
  * micro-batch splits and arrival inversions).
  *
  * STATE IS BOUNDED when `lateness` is set: resolved prefixes leave
  * the buffer (the `resolveCut` cut), so steady-state memory is
  * O(events inside the lateness window + one unresolved attempt span)
  * per key — flat over an arbitrarily long stream, observable via
  * `n_buffered`. Without a watermark nothing is ever finalized
  * (exact mode: the whole history stays re-scannable). Events
  * arriving BELOW an already-resolved frontier (beyond allowed
  * lateness) cannot be spliced into a resolved prefix; they are
  * dropped and counted in `n_late_dropped` — the same contract every
  * CEP engine carries for beyond-lateness data.
  *
  * Scale shape: per-key state only, no shuffle beyond the groupByKey
  * exchange; triples are 20 bytes/event like the batch collect. The
  * q73/q84/q124 state-machine family's streaming face.
  */
object StreamingSequenceMatch {

  /** `floorTs`/`floorId` — the (ts_us, event_id) of the LAST RESOLVED
    * (dropped) buffer position: the immutability boundary. An arrival
    * ordering at or below it would splice into an already-finalized
    * prefix, so it is dropped; anything above it — even below the
    * current watermark — still lands in the live buffer and is folded
    * exactly.
    */
  case class SeqMatchState(
      nFinal: Long, nLateDropped: Long,
      floorTs: Long, floorId: Long,
      pending: List[(Long, Long, Int)])

  case class SeqMatchUpdate(
      user_id: Long, n_final: Long, n_tentative: Long,
      n_buffered: Long, n_late_dropped: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Live matches of `pattern` per user over the event stream.
    *
    * @param lateness allowed lateness (e.g. "10 minutes"); requires
    *                 event-time ordering only within that bound.
    *                 None = exact mode: unbounded buffer, nothing
    *                 finalized, nothing dropped.
    */
  def matches(events: Dataset[EventStreams.Event], pattern: Seq[Step],
              lateness: Option[String] = None,
              skipPastLastRow: Boolean = true): Dataset[SeqMatchUpdate] = {
    require(pattern.nonEmpty, "empty pattern")
    val spark = events.sparkSession
    import spark.implicits._
    val syms = pattern.map(_.symbol).distinct
    val symIdx = syms.zipWithIndex.toMap
    val atoms = SequenceMatch.compile(pattern, symIdx)
    val skip = skipPastLastRow

    def fn(userId: Long, it: Iterator[EventStreams.Event],
           state: GroupState[SeqMatchState]): SeqMatchUpdate = {
      val prev = state.getOption
        .getOrElse(SeqMatchState(0L, 0L, Long.MinValue, Long.MinValue, Nil))
      // without a watermark the frontier stays at 0 — exact mode
      // (getCurrentWatermarkMs throws when none is set)
      val frontierUs =
        if (lateness.isDefined) state.getCurrentWatermarkMs() * 1000L else 0L
      var late = prev.nLateDropped
      val incoming = it.map { e =>
        // symbol index, or −1: foreign rows occupy positions and can
        // break a match — the batch operator's contract
        (tsMicros(e.ts), e.event_id, symIdx.getOrElse(e.event_type, -1))
      }.filter { t =>
        val ok = t._1 > prev.floorTs || (t._1 == prev.floorTs && t._2 > prev.floorId)
        if (!ok) late += 1
        ok
      }.toList
      val pending = (prev.pending ++ incoming).sortBy(t => (t._1, t._2))

      // resolve the immutable prefix: first index at/above the frontier
      val arr = pending.toArray
      val symArr = arr.map(_._3)
      var fIdx = 0
      while (fIdx < arr.length && arr(fIdx)._1 < frontierUs) fIdx += 1
      val (resolved, cut) = SequenceMatch.resolveCut(atoms, symArr, fIdx, skip)
      val keep = pending.drop(cut)
      val (floorTs, floorId) =
        if (cut > 0) (arr(cut - 1)._1, arr(cut - 1)._2)
        else (prev.floorTs, prev.floorId)

      // tentative = full matches over what remains in the buffer
      val keepArr = keep.toArray
      val tentative = SequenceMatch.scan(atoms,
        keepArr.map(_._2), keepArr.map(_._3), skip).size

      val nFinal = prev.nFinal + resolved
      state.update(SeqMatchState(nFinal, late, floorTs, floorId, keep))
      SeqMatchUpdate(userId, nFinal, tentative.toLong, keep.size.toLong, late)
    }

    lateness.fold(events)(l => events.withWatermark("ts", l))
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
