package graft.streaming

import graft.functions.CountMin
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** D18 — live per-key FREQUENCY estimation with Count-Min state: the
  * streaming face of q66/q104's sketch, completing the streaming
  * sketch family (D13 Misra-Gries answers "which items are frequent",
  * this answers "how frequent is THIS item", D17 HLL answers "how
  * many distinct"). State per key is the depth×width counter table
  * itself; each micro-batch folds occurrences through the same
  * CmsHash path the batch aggregates use, and counter ADDITION is
  * commutative/associative, so the state after ANY micro-batch
  * sequence is CELL-IDENTICAL to a batch sketch of all occurrences —
  * streamed probe estimates equal the batch aggregate's exactly
  * (spec-pinned), and both CMS guarantees (never undercount,
  * overcount ≤ ~N·depth·2/width per the q66 slack) carry over
  * verbatim because the structure IS the batch structure.
  *
  * O(depth·width) state per key forever — the sketch is the bound,
  * no watermark needed (the D13/D17 argument).
  */
object StreamingFrequency {

  case class KeyedToken(key: String, token: String)
  case class FrequencyUpdate(key: String, n_tokens: Long, estimates: Seq[Long])

  /** Per update: the key's total occurrence count and one min-over-
    * rows estimate per probe, from live state.
    */
  def frequencies(tokens: Dataset[KeyedToken], probes: Seq[String],
                  depth: Int = 4, width: Int = 1024): Dataset[FrequencyUpdate] = {
    require(depth >= 1 && width >= 16, s"bad sketch geometry: $depth x $width")
    // CmsHash.pos masks with (width-1): a non-power-of-two width would
    // silently alias cells and break cell-identity with the batch
    // CountMinSketchAgg/CountMinTableAgg (which carry the same check).
    require((width & (width - 1)) == 0, s"width must be a power of two: $width")
    val spark = tokens.sparkSession
    import spark.implicits._

    def fn(key: String, it: Iterator[KeyedToken],
           state: GroupState[(Array[Long], Long)]): FrequencyUpdate = {
      val (table, n0) = state.getOption.getOrElse((new Array[Long](depth * width), 0L))
      var n = n0
      it.foreach { kt => CountMin.add(table, kt.token, depth, width); n += 1 }
      state.update((table, n))
      FrequencyUpdate(key, n, probes.map(CountMin.estimate(table, _, depth, width)))
    }

    tokens.groupByKey(_.key).mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
