package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical rollup over a DAG — BOM explosion (bill-of-
  * materials), org-chart descendant totals, dependency-cost
  * accumulation: given (parent, child, qty) edges, the total
  * requirement of every node reachable from a root is the sum over
  * all root→node paths of the product of edge quantities. A
  * DIFFERENT recursion class from Bfs: paths carry multiplicative
  * weights and every path contributes (aggregation along paths),
  * where BFS keeps only the shortest.
  *
  * Level-synchronous algorithm: a node's total is complete only when
  * every parent's total is final, and level(node) = longest path
  * from the root guarantees exactly that ordering — so phase 1
  * computes levels by WORKLIST max-propagation (each round joins
  * edges against the FRONTIER of nodes whose level just improved,
  * not the whole level table — on a depth-d chain that is O(1)
  * frontier rows per round, not O(n)), and phase 2 sweeps levels in
  * order, expanding the completed level's totals through its
  * out-edges into a PENDING contributions table from which each
  * settled level's rows are PRUNED (the r8 design note: an
  * ever-growing union re-materialized per round is O(depth²) on deep
  * BOMs; pruning keeps pending at frontier scale). Both loops are
  * depth-bounded with one driver scalar per round and localCheckpoint
  * lineage truncation — per-level results checkpoint eagerly
  * (level-scale), the pending set truncates at a stride, and the
  * final assembly is a BALANCED union of the checkpointed level
  * frames (log-depth plan however deep the BOM — the depth-200
  * HierarchySpec pin). Cycles make a BOM meaningless: phase 1's
  * fixpoint not settling within maxIter fails fast.
  */
object Hierarchy {

  /** Balanced fold of unionByName: a left fold nests `frames.size`
    * Union nodes deep (a depth-500 BOM would carry a 500-deep plan
    * into every downstream optimization pass); pairwise folding is
    * log-depth.
    */
  private def balancedUnion(frames: Seq[DataFrame]): DataFrame = {
    var layer = frames
    while (layer.size > 1)
      layer = layer.grouped(2).map {
        case Seq(a, b) => a.unionByName(b)
        case Seq(a)    => a
      }.toSeq
    layer.head
  }

  /** (node, level, total_qty) for every node reachable from `rootId`
    * (the root itself at level 0, total 1). Parallel edges are
    * summed; unreachable nodes are absent.
    */
  def bomExplode(
      edges: DataFrame,
      rootId: Long,
      parentCol: String = "parent",
      childCol: String = "child",
      qtyCol: String = "qty",
      maxIter: Int = 50,
      checkpointStride: Int = 8): DataFrame = {
    require(checkpointStride >= 1, s"bad stride $checkpointStride")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.groupBy(col(parentCol).as("p"), col(childCol).as("c"))
      .agg(sum(col(qtyCol)).as("q")).persist()

    // Phase 1: levels by worklist longest-path propagation. Each
    // round: propagate from the frontier only; keep improvements;
    // merge into the level table. Improvements reach a fixpoint in
    // ≤ depth rounds on a DAG; a cycle improves forever → fail fast.
    var levels = Seq((rootId, 0L)).toDF("id", "lv").localCheckpoint()
    var frontier = levels
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxIter) {
      round += 1
      val prop = e.join(frontier.withColumnRenamed("id", "p"), "p")
        .groupBy(col("c").as("id")).agg(max(col("lv") + 1L).as("lv"))
      val improved = prop.join(levels.withColumnRenamed("lv", "lv0"), Seq("id"), "left")
        .filter(col("lv0").isNull || col("lv") > col("lv0"))
        .select("id", "lv").localCheckpoint()
      changed = improved.count()
      if (changed > 0) {
        levels = levels.unionByName(improved)
          .groupBy("id").agg(max(col("lv")).as("lv")).localCheckpoint()
        frontier = improved
      }
    }
    if (changed > 0) {
      e.unpersist()
      throw new IllegalStateException(
        s"levels did not settle in $maxIter rounds — cycle reachable from $rootId?")
    }

    // Phase 2: sweep levels ascending. Every contribution knows its
    // target's level at creation (one keyed join against the settled
    // level table), so once level l+1 settles, its rows leave the
    // pending set — pending holds only contributions to levels still
    // ahead, instead of the whole history.
    val depth = levels.agg(max(col("lv"))).head().getLong(0)
    var doneNow = Seq((rootId, 0L, 1L)).toDF("id", "lv", "total").localCheckpoint()
    val perLevel = scala.collection.mutable.ArrayBuffer(doneNow)
    var pending = spark.emptyDataset[(Long, Long, Long)].toDF("id", "lv", "part")
    for (l <- 0L until depth) {
      val newContrib = e.join(doneNow.withColumnRenamed("id", "p").select("p", "total"), "p")
        .select(col("c").as("id"), (col("total") * col("q")).as("part"))
        .join(levels, "id")
        .select(col("id"), col("lv"), col("part"))
      pending = pending.unionByName(newContrib)
      val settled = pending.filter(col("lv") === l + 1L)
        .groupBy("id", "lv").agg(sum(col("part")).as("total"))
        .localCheckpoint() // level-scale: the one eager job per round
      pending = pending.filter(col("lv") > l + 1L)
      if ((l + 1) % checkpointStride == 0) pending = pending.localCheckpoint()
      doneNow = settled
      perLevel += settled
    }
    e.unpersist()
    balancedUnion(perLevel.toSeq)
      .select(col("id").as("node"), col("lv").as("level"), col("total").as("total_qty"))
  }
}
