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
  * computes levels by iterated max-propagation (one keyed
  * join + max agg per round, monotone, fixpoint ≤ depth rounds),
  * and phase 2 sweeps levels in order, expanding the completed
  * level's totals through its out-edges into a contributions table
  * (one join + one partial-agg'd groupBy per level). Both loops are
  * diameter-bounded with one driver scalar per round and
  * localCheckpoint lineage truncation — the CC/PageRank/Bfs driver
  * contract. Cycles make a BOM meaningless: phase 1's fixpoint not
  * settling every reachable node within maxIter fails fast.
  */
object Hierarchy {

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
      maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.groupBy(col(parentCol).as("p"), col(childCol).as("c"))
      .agg(sum(col(qtyCol)).as("q")).persist()

    // Phase 1: levels by monotone longest-path propagation.
    var levels = Seq((rootId, 0L)).toDF("id", "lv").localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxIter) {
      round += 1
      val next = e.join(levels.withColumnRenamed("id", "p"), "p")
        .groupBy(col("c").as("id")).agg(max(col("lv") + 1L).as("lv"))
      val merged = levels.unionByName(next)
        .groupBy("id").agg(max(col("lv")).as("lv")).localCheckpoint()
      changed = merged.join(levels.withColumnRenamed("lv", "lv0"), Seq("id"), "left")
        .filter(col("lv0").isNull || col("lv") =!= col("lv0")).count()
      levels = merged
    }
    if (changed > 0) {
      e.unpersist()
      throw new IllegalStateException(
        s"levels did not settle in $maxIter rounds — cycle reachable from $rootId?")
    }

    // Phase 2: sweep levels ascending; expanding a completed level
    // through its out-edges. Contributions to deeper levels
    // accumulate until their own level completes.
    val depth = levels.agg(max(col("lv"))).head().getLong(0)
    var totals = Seq((rootId, 0L, 1L)).toDF("id", "lv", "total").localCheckpoint()
    var contrib = spark.emptyDataset[(Long, Long)].toDF("id", "part")
    for (l <- 0L until depth) {
      val doneNow = totals.filter(col("lv") === l)
      val newContrib = e.join(doneNow.withColumnRenamed("id", "p"), "p")
        .select(col("c").as("id"), (col("total") * col("q")).as("part"))
      contrib = contrib.unionByName(newContrib).localCheckpoint()
      val settled = contrib
        .join(levels.filter(col("lv") === l + 1L), "id")
        .groupBy("id", "lv").agg(sum(col("part")).as("total"))
      totals = totals.unionByName(settled).localCheckpoint()
    }
    e.unpersist()
    totals.select(col("id").as("node"), col("lv").as("level"), col("total").as("total_qty"))
  }
}
