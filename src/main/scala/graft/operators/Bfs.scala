package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a directed edge list —
  * shortest unweighted path length from the nearest source to every
  * reachable node. The traversal primitive the graph suite (CC,
  * PageRank, k-core, triangles) was missing: reachability radius,
  * crawl-depth labeling, "how far is this domain from a trusted
  * seed" quality signals.
  *
  * Frontier algorithm: round i expands the round-(i−1) frontier one
  * edge hop, anti-joins out already-settled nodes (BFS settles a
  * node at its FIRST visit, which in an unweighted graph is the
  * minimal hop count), and unions the survivors into the distance
  * table at dist = i. Terminates when the frontier is empty — at
  * most eccentricity(sources) rounds, each one shuffle join keyed on
  * node id plus one distinct and one anti join. Driver involvement
  * is one count per round (the empty-frontier test); lineage is
  * truncated per round with `localCheckpoint` so round N never
  * replays rounds 1..N−1. Frontier size is the natural unit of
  * parallelism — at 100 TB edge scale every round is a keyed
  * shuffle, never a broadcast of the frontier (frontiers can be
  * corpus-sized in the middle rounds of a small-diameter web graph).
  *
  * Throws IllegalStateException if `maxIter` rounds leave a
  * non-empty frontier: a truncated BFS silently reports unreached
  * nodes as "unreachable", which downstream consumers cannot
  * distinguish from truth. Rounds are diameter-bounded, so the
  * remedy is raising `maxIter`, not tolerating the partial answer.
  */
object Bfs {

  /** (id, dist) for every node reachable from `sources` (dist 0 at
    * the sources themselves, ties to the nearest source). Nodes not
    * reached do not appear — callers owning a node universe
    * left-join and fill. For undirected traversal pass a
    * symmetrized edge list.
    */
  def hopDistances(
      edges: DataFrame,
      sources: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id",
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst")).persist()
    // Each round's frontier frame is localCheckpoint'ed ONCE; the
    // settled set is a union over those cached frames, so it needs no
    // re-checkpoint of its own (every leaf is already materialized —
    // the lineage stays flat and no round ever replays a prior one).
    // Per round that is one materializing job + one cache-read count.
    var dist = sources.select(col(idCol).as("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist.select("id")
    var round = 0
    var frontierN = frontier.count()
    while (frontierN > 0 && round < maxIter) {
      round += 1
      val next = e.join(frontier.withColumnRenamed("id", "_src"), "_src")
        .select(col("_dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("dist", lit(round.toLong))
        .localCheckpoint()
      frontier = next.select("id")
      dist = dist.union(next)
      frontierN = frontier.count()
    }
    e.unpersist()
    if (frontierN > 0)
      throw new IllegalStateException(
        s"BFS frontier still ${frontierN} nodes after $maxIter rounds — raise maxIter")
    dist
  }
}
