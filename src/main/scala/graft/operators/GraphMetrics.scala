package graft.operators

import graft.Exec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node degree and triangle counts over an undirected simple
  * graph, rounding out the graph suite (ConnectedComponents for
  * dedup islands, PageRank for centrality priors; triangles/degree
  * for local density — spam-farm detection and community scoring in
  * web-corpus curation).
  *
  * Triangle enumeration uses DEGREE-ORDERED ORIENTATION (Schank's
  * algorithm, the standard distributed formulation): every canonical
  * edge is directed from its lower-(degree, id) endpoint to the
  * higher one, wedges are enumerated only at each node's oriented
  * out-neighborhood, and a wedge closes iff its oriented third edge
  * exists. Orientation bounds every out-degree by O(√m), so total
  * wedge volume is O(m^1.5) REGARDLESS of degree skew — a hub with
  * degree d contributes d wedges as the low corner of other nodes'
  * orientations, not d² of its own. All three steps are key-shuffle
  * joins (edge → u; wedge → (v,w)); nothing is broadcast (the edge
  * set is unbounded) and nothing funnels to the driver. Triangle
  * counts are orientation-invariant, so the DuckDB oracle's simpler
  * id-ordered formulation (q86) must agree exactly.
  *
  * `nodeMetrics` caches the shared edge-scale subtrees (canonical
  * edges, degrees, oriented edges): the oriented edge set feeds
  * three self-join references and the canonicalization `distinct`
  * shuffle would otherwise re-run once per reference. The triangle
  * corner stream itself is never materialized — it flows straight
  * into the per-node aggregate (triangle volume can exceed m; only
  * the node-scale result is checkpointed, per Exec.withCached's
  * contract).
  */
object GraphMetrics {

  /** Canonicalize arbitrary edge rows to deduped a<b pairs: both
    * directions collapse, self-loops drop.
    */
  def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
      least(col(srcCol), col(dstCol)).as("a"),
      greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Node degrees of the canonical graph (nodes with ≥1 edge). */
  def degrees(canon: DataFrame): DataFrame =
    canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Direct each canonical edge from its lower-(degree, id) endpoint
    * to the higher: (u, v, dv) with rank(u) < rank(v); `dv` carries
    * the head's degree so wedge enumeration can order out-neighbors
    * without a re-join.
    */
  def orient(canon: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, col("db")).otherwise(col("da")).as("dv"))
  }

  /** One row per triangle, as its three corners (u, v1, v2). */
  def triangles(canon: DataFrame, deg: DataFrame): DataFrame =
    trianglesOriented(orient(canon, deg))

  private def trianglesOriented(oriented: DataFrame): DataFrame = {
    val x = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val y = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = x.join(y,
      Seq("u")).filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
      .select(col("u"), col("v1"), col("v2"))
    // the closing edge is oriented v1→v2 by construction: rank(v1) <
    // rank(v2), and orientation directed it that way if it exists
    wedges.join(oriented.select(col("u").as("v1"), col("v").as("v2")),
      Seq("v1", "v2"), "left_semi")
  }

  /** (node, degree, triangles) for every node with at least one
    * edge; `triangles` counts the triangles the node is a corner of.
    *
    * ONE lazy plan, no explicit caching: the shared subtrees (the
    * canonicalization `distinct`, the degree aggregate, the oriented
    * edge set) each end at an exchange, and Spark's exchange reuse
    * (`spark.sql.exchange.reuse`, on by default, AQE-preserved)
    * dedupes the identical subtrees — the lineitem-scale work below
    * each shuffle runs ONCE however many times the plan references
    * it. Measured against the persist-count-checkpoint formulation
    * this held in r13 (`Exec.withCachedChain`): the lazy plan is
    * ~0.2-0.4 s faster per call at sf0.1 (saves the eager count job,
    * the result-checkpoint job, and three persist/unpersist round
    * trips) and leaves ZERO persistent blocks behind, where the
    * cached version retired one result-checkpoint block set per call
    * (the r13→r14 q86 bench-drift adjudication; PLANS.md). Callers
    * that re-execute the RESULT many times should persist it
    * themselves — `nodeMetricsCached` does exactly that.
    */
  def nodeMetrics(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol)
    val deg = degrees(canon)
    joinMetrics(deg, orient(canon, deg))
  }

  /** `nodeMetrics` materialized against an explicitly cached chain —
    * for sessions running with exchange reuse DISABLED (where every
    * plan reference re-runs the canonicalization shuffle) or callers
    * that act on the result repeatedly. The result rides a
    * (local)checkpoint whose blocks outlive the call by design; a
    * caller discarding it must `Exec.freeCheckpoint` it.
    */
  def nodeMetricsCached(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol)
    val deg = degrees(canon)
    val oriented = orient(canon, deg)
    Exec.withCachedChain(Seq(canon, deg, oriented)) {
      joinMetrics(deg, oriented)
    }
  }

  /** The k-CORE: nodes of the maximal subgraph in which every node
    * has degree ≥ k (with their within-core degree) — the classic
    * density filter above triangles (spam farms and tight communities
    * survive high-k cores; tendrils and link chains peel away). The
    * k-core is UNIQUE, so the result is peel-order-independent and a
    * driver-side reference peel must agree exactly (spec).
    *
    * Iterative peeling: drop all nodes of degree < k, recompute
    * degrees, repeat to fixpoint. Each round is one degree aggregate
    * + two anti-joins on the edge list (all key shuffles, nothing
    * broadcast, nothing data-sized on the driver — one emptiness
    * probe per round), with `localCheckpoint` lineage truncation per
    * round (the ConnectedComponents pattern). Round count is bounded
    * by the peel depth, data-dependent but small for power-law
    * graphs; `maxIter` fail-fasts rather than returning a partially
    * peeled (NOT-a-core) subgraph — a k=2 peel of a long path needs
    * length/2 rounds, so chain-heavy graphs may need a higher cap.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    var canon = canonical(edges, srcCol, dstCol).localCheckpoint()
    // retired peel-round checkpoints are freed on every exit path;
    // only the final canon (the returned degree plan's leaf) survives
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var iter = 0
    while (iter < maxIter) {
      val deg = degrees(canon)
      val losers = deg.filter(col("degree") < k).select(col("node"))
      if (losers.isEmpty) { retired.foreach(graft.Exec.freeCheckpoint); return deg }
      retired += canon
      canon = canon
        .join(losers.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
        .join(losers.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
        .localCheckpoint()
      iter += 1
    }
    // one fixpoint check after the last allowed peel
    val deg = degrees(canon)
    retired.foreach(graft.Exec.freeCheckpoint)
    if (deg.filter(col("degree") < k).isEmpty) deg
    else {
      graft.Exec.freeCheckpoint(canon)
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach the fixpoint after $maxIter peel rounds — " +
          "returning now would yield a subgraph that is NOT the k-core. Raise " +
          "maxIter (rounds are peel-depth-bounded).")
    }
  }

  private def joinMetrics(deg: DataFrame, oriented: DataFrame): DataFrame = {
    val tri = trianglesOriented(oriented)
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(tri, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
