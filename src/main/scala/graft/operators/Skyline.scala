package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Skyline (Pareto frontier) — all rows not DOMINATED on a set of
  * minimize-dimensions (b dominates a iff b ≤ a on every dimension
  * and < on at least one): the multi-criteria shortlist operator
  * (cheapest-AND-smallest parts, best quality-per-cost corpora
  * sources) that no single ORDER BY can express.
  *
  * Distributed shape: the skyline operator is DISTRIBUTIVE —
  * skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B) — so phase 1 computes a
  * local skyline per partition (an imperative dominance scan:
  * each row is checked against the partition's running frontier,
  * evicting anything it dominates — O(n·s) with s the local frontier
  * size), and phase 2 re-runs the same scan over the union of local
  * frontiers in one partition. The final pass is single-partition BY
  * DESIGN: a skyline is an anti-chain, which on real (correlated)
  * data is tiny regardless of input scale — the two-phase cut is
  * what makes the global pass small. For adversarial anti-correlated
  * data where the frontier itself is huge, the published remedy is
  * grid/angular partitioning of phase 2; the per-partition scan here
  * is reusable unchanged as its kernel.
  *
  * Ties (rows equal on ALL dimensions) dominate nothing and are all
  * kept — the standard skyline contract, and what keeps the output a
  * deterministic SET under any partitioning (spec-pinned).
  */
object Skyline {

  /** Rows of (id, dims...) not dominated under minimize-all
    * semantics. Dimension columns are cast to long — exact integer
    * comparisons only (scale doubles to cents upstream). Rows with a
    * null dimension (including a failed cast, e.g. a non-numeric
    * string) are DROPPED before the scan: null has no place in a
    * dominance order, and the alternative is an opaque NPE mid-scan.
    */
  def skyline(df: DataFrame, idCol: String, dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "need at least one dimension")
    val slim = df.select(
      (col(idCol).cast("long").as("id") +: dimCols.map(c => col(c).cast("long").as(c))): _*)
      .na.drop("any", dimCols)
    val nd = dimCols.size

    def pass(d: DataFrame): DataFrame = {
      val schema = d.schema
      d.mapPartitions { it =>
        val kept = ArrayBuffer.empty[Row]
        // does a dominate b?
        def dom(a: Row, b: Row): Boolean = {
          var allLe = true; var oneLt = false; var i = 1
          while (i <= nd && allLe) {
            val x = a.getLong(i); val y = b.getLong(i)
            if (x > y) allLe = false else if (x < y) oneLt = true
            i += 1
          }
          allLe && oneLt
        }
        it.foreach { r =>
          if (!kept.exists(k => dom(k, r))) {
            var i = 0
            while (i < kept.length) {
              if (dom(r, kept(i))) kept.remove(i) else i += 1
            }
            kept += r
          }
        }
        kept.iterator
      }(Encoders.row(schema))
    }

    pass(pass(slim).repartition(1))
  }
}
