package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-pattern matching over ordered per-key event streams — the
  * MATCH_RECOGNIZE class of operator (SQL:2016; Flink CEP / Trino
  * have it, Spark OSS does not): find NON-OVERLAPPING occurrences of
  * a symbol regex (concatenation with ONE / OPT(`?`) / PLUS(`+`) /
  * STAR(`*`) quantifiers) in each key's event sequence and emit one
  * row per match. This generalizes the funnel operators (q73/q84
  * measure how DEEP a fixed chain gets; this finds every occurrence
  * of a real pattern, with quantifiers).
  *
  * Semantics (documented, oracle-checked):
  *  - events order by (orderCol, idCol) per key — fully deterministic;
  *  - symbols are assigned map-side by a codegen'd expression
  *    (classification stays in Tungsten; the NFA only ever sees
  *    integer symbols);
  *  - matching scans each key's sequence left to right; at each
  *    position the compiled NFA (Thompson bitmask simulation —
  *    pattern compiles to ≤ 62 atoms, one Long of states) runs
  *    forward and the LONGEST accepting prefix wins (per-attempt
  *    longest match); empty matches never emit;
  *  - after a match, scanning resumes past its last row
  *    (AFTER MATCH SKIP PAST LAST ROW, the MATCH_RECOGNIZE default)
  *    or at the next row (`skipPastLastRow = false`, overlapping
  *    starts allowed);
  *  - a failed attempt advances one row. Attempts whose first
  *    mandatory symbol doesn't match die in O(1), so anchored
  *    patterns (the practical case) cost O(n) per key; adversarial
  *    all-optional patterns degrade toward O(n · match length) —
  *    the same bound every MATCH_RECOGNIZE engine carries.
  *
  * Shape: ONE hash exchange on the key; each key's events collect
  * into a sorted array (ObjectHashAggregate pair — partial
  * collect map-side) and the automaton emits matches in a typed
  * flatMap. The per-key buffer holds (order, id, symbol) triples
  * only — 20 bytes/event, never the event payload — bounded by
  * per-key activity, the q73 funnel contract. At 100 TB this is the
  * right shape: pattern state cannot cross keys, so the keyed
  * shuffle is the minimal data movement, and hot keys bound memory
  * by their own activity, not the corpus.
  */
object SequenceMatch {

  sealed trait Quant extends Product with Serializable
  /** exactly one */ case object One extends Quant
  /** zero or one */ case object Opt extends Quant
  /** one or more (greedy) */ case object Plus extends Quant
  /** zero or more (greedy) */ case object Star extends Quant

  final case class Step(symbol: String, quant: Quant = One)

  // compiled atom kinds: 0 = consume-once, 1 = optional, 2 = self-loop
  private[graft] def compile(pattern: Seq[Step], symIdx: Map[String, Int]): Array[(Int, Int)] = {
    val atoms = pattern.flatMap { st =>
      val s = symIdx(st.symbol)
      st.quant match {
        case One  => Seq((s, 0))
        case Opt  => Seq((s, 1))
        case Star => Seq((s, 2))
        case Plus => Seq((s, 0), (s, 2)) // x+ ≡ x x*
      }
    }.toArray
    require(atoms.length <= 62, s"pattern too long: ${atoms.length} atoms > 62")
    atoms
  }

  /** ε-closure: Opt/Star atoms may be skipped; one left-to-right pass
    * settles the chain (ε edges only go j → j+1).
    */
  private def closure(mask0: Long, atoms: Array[(Int, Int)]): Long = {
    var mask = mask0
    var j = 0
    while (j < atoms.length) {
      if ((mask & (1L << j)) != 0L && atoms(j)._2 != 0) mask |= 1L << (j + 1)
      j += 1
    }
    mask
  }

  private def transition(mask: Long, sym: Int, atoms: Array[(Int, Int)]): Long = {
    var out = 0L
    var j = 0
    while (j < atoms.length) {
      if ((mask & (1L << j)) != 0L && atoms(j)._1 == sym)
        out |= (if (atoms(j)._2 == 2) 1L << j else 1L << (j + 1))
      j += 1
    }
    closure(out, atoms)
  }

  /** One key's matches: (start_id, end_id, n_rows) per match in scan
    * order. `ids`/`syms` are the key's events in (order, id) order.
    */
  private[graft] def scan(atoms: Array[(Int, Int)], ids: Array[Long], syms: Array[Int],
                          skipPastLastRow: Boolean): Seq[(Long, Long, Long)] = {
    val m = atoms.length
    val acceptBit = 1L << m
    val init = closure(1L, atoms)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val n = syms.length
    var i = 0
    while (i < n) {
      var mask = init
      var last = -1
      var j = i
      while (j < n && mask != 0L) {
        mask = transition(mask, syms(j), atoms)
        if ((mask & acceptBit) != 0L) last = j
        j += 1
      }
      if (last >= i) {
        out += ((ids(i), ids(last), (last - i + 1).toLong))
        i = if (skipPastLastRow) last + 1 else i + 1
      } else i += 1
    }
    out.toSeq
  }

  /** Streaming-finalization walk (the D20 primitive): run the same
    * attempt loop over a key's buffered sequence, but only RESOLVE
    * attempts that complete strictly inside the immutable prefix —
    * positions `< fIdx`, where `fIdx` is the first buffer index whose
    * event time has not yet passed the allowed-lateness watermark.
    * An attempt is resolved when its NFA mask DIED at a position
    * `< fIdx`: no later insertion (all land at positions ≥ fIdx) and
    * no future append can revive it or extend its longest match. The
    * walk stops at the first unresolved attempt.
    *
    * Returns (finalMatches, cut): matches that can be emitted
    * permanently, and the buffer index where the next attempt starts —
    * everything before `cut` can be dropped from state, which is what
    * bounds streaming memory to O(events inside the lateness window).
    */
  private[graft] def resolveCut(atoms: Array[(Int, Int)], syms: Array[Int],
                                fIdx: Int, skipPastLastRow: Boolean): (Int, Int) = {
    val acceptBit = 1L << atoms.length
    val init = closure(1L, atoms)
    val n = syms.length
    var i = 0
    var nFinal = 0
    var cut = 0
    var resolved = true
    while (i < n && resolved) {
      var mask = init
      var last = -1
      var j = i
      while (j < n && mask != 0L) {
        mask = transition(mask, syms(j), atoms)
        if ((mask & acceptBit) != 0L) last = j
        j += 1
      }
      // mask alive at buffer end → a future append could extend the
      // longest match; died at j−1 → resolved iff that death position
      // is inside the immutable prefix
      val died = if (mask != 0L) n else j - 1
      if (died < fIdx) {
        if (last >= i) {
          nFinal += 1
          i = if (skipPastLastRow) last + 1 else i + 1
        } else i += 1
        cut = i
      } else resolved = false
    }
    (nFinal, cut)
  }

  /** Match occurrences of `pattern` in each key's ordered stream.
    *
    * @param keyCol    partition key (cast to long)
    * @param idCol     unique row id (long) — reported as match bounds
    * @param orderCol  monotone order value (long, e.g. unix_micros);
    *                  ties break on idCol
    * @param symbolCol event symbol (string); rows whose symbol is not
    *                  in the pattern still occupy positions (they can
    *                  break a match) but never advance one
    * @return (keyCol, match_id, start_id, end_id, n_rows) with
    *         match_id numbering each key's matches in scan order
    */
  def matches(events: DataFrame, keyCol: String, idCol: String, orderCol: String,
              symbolCol: String, pattern: Seq[Step],
              skipPastLastRow: Boolean = true): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    val syms = pattern.map(_.symbol).distinct
    val symIdx = syms.zipWithIndex.toMap
    val atoms = compile(pattern, symIdx)
    val spark = events.sparkSession
    import spark.implicits._
    // codegen'd symbol classification — the NFA sees integers only
    val symExpr = syms.foldLeft(lit(-1)) { (acc, s) =>
      when(col(symbolCol) === s, lit(symIdx(s))).otherwise(acc)
    }
    val skip = skipPastLastRow
    events
      .select(col(keyCol).cast("long").as("k"), col(orderCol).cast("long").as("o"),
        col(idCol).cast("long").as("i"), symExpr.as("s"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("o"), col("i"), col("s")))).as("evs"))
      .as[(Long, Seq[(Long, Long, Int)])]
      .flatMap { case (key, evs) =>
        val ids = new Array[Long](evs.length)
        val ss = new Array[Int](evs.length)
        var p = 0
        evs.foreach { e => ids(p) = e._2; ss(p) = e._3; p += 1 }
        scan(atoms, ids, ss, skip).zipWithIndex.map { case ((s0, e0, nr), ix) =>
          (key, (ix + 1).toLong, s0, e0, nr)
        }
      }
      .toDF(keyCol, "match_id", "start_id", "end_id", "n_rows")
  }
}
