package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the link-graph QUALITY PRIOR
  * for web-derived corpora: crawl curation weights documents by their
  * host/page centrality (harmonic/PageRank-family scores) before
  * content signals ever run, and link analysis is the classic
  * whole-graph companion to ConnectedComponents' similarity grouping.
  *
  * Power iteration, one narrow shuffle per round: contributions =
  * (ranks ⋈ edges on src, rank/out-degree) → groupBy(dst) sum; the
  * new rank is (1−d)/N + d·(contribs + dangling/N) where the dangling
  * mass (rank parked on nodes with no out-links — crawl frontiers are
  * full of them) redistributes uniformly, keeping Σ ranks = 1 every
  * round (asserted by the spec, and the standard correctness
  * invariant). Out-degrees precompute once; lineage truncates per
  * round with localCheckpoint (the ConnectedComponents pattern —
  * round N's plan must not replay rounds 1..N−1); driver involvement
  * is one tiny scalar aggregate per round (the dangling mass), never
  * a data collect. `iters` bounds the rounds (10–20 ≈ convergence for
  * link graphs); an optional `tol` adds the L1-delta stopping rule —
  * stop once Σ|r_new − r_old| < tol — costing one more scalar
  * aggregate per round (a self-join of two model-sized rank tables,
  * never corpus data).
  */
object PageRank {

  /** (id, rank) for every node in `edges` (either side), damping `d`,
    * at most `iters` power-iteration rounds, early-stopped when the
    * L1 rank delta drops below `tol` (None = always run all rounds).
    */
  def ranks(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
            d: Double = 0.85, iters: Int = 10,
            tol: Option[Double] = None): DataFrame = {
    require(iters >= 1 && d > 0 && d < 1, s"bad params: d=$d iters=$iters")
    require(tol.forall(_ > 0), s"tol must be positive: $tol")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph: edge list has no nodes (1/n would be Infinity)")
    val outDeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("out_deg")).persist()

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    // retired per-round rank checkpoints are freed on exit; only the
    // final one (the returned plan's leaf) survives
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val withDeg = ranks.join(outDeg, Seq("id"), "left")
      // dangling mass: a tiny scalar aggregate, not a collect
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .join(e, col("id") === col("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("out_deg")).as("_c"))
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - d) / n) + lit(d) *
            (coalesce(col("_c"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint(true)
      tol.foreach { t =>
        // L1 delta — the second scalar per round; both sides are
        // checkpointed model-sized rank tables
        val delta = ranks.select(col("id"), col("rank").as("_old"))
          .join(next, Seq("id"))
          .agg(sum(abs(col("rank") - col("_old")))).head().getDouble(0)
        if (delta < t) converged = true
      }
      retired += ranks
      ranks = next
      i += 1
    }
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    retired.foreach(graft.Exec.freeCheckpoint)
    ranks
  }
}
