package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * computes levels by WORKLIST max-propagation from the frontier of
  * nodes whose level just improved, and phase 2 sweeps levels in
  * order, expanding each settled level's totals through its
  * out-edges into a carried contributions set from which settled
  * levels' rows are PRUNED (the r8 design note: an ever-growing
  * union re-materialized per round is O(depth²) on deep BOMs;
  * pruning keeps the carry at frontier scale). Cycles make a BOM
  * meaningless: phase 1's fixpoint not settling within `maxIter`
  * rounds fails fast.
  *
  * r13: the engine is a Pregel-style RDD loop behind the DataFrame
  * API (the one operator in this library where DataFrames are the
  * WRONG substrate — adjudicating the q117 cross-round drift showed
  * why). An iterative frontier loop declared per-round in DataFrames
  * pays, per round, a full Catalyst analyze/optimize pass, a fresh
  * whole-stage-codegen compile, an AQE query-stage materialization
  * per exchange, and a broadcast build job — ~0.55 s/round on an
  * idle local[32] box REGARDLESS of data size (measured: 11 rounds ≈
  * 6.9 s with one hop per round; batching k hops per round moved the
  * same cost into k sequential in-round stages, ~2.5 s per 4-hop
  * round — the latency is per HOP, and hops are inherently
  * sequential). Frontier iteration is the workload Catalyst cannot
  * amortize: round COUNT scales with graph depth while per-round
  * data is frontier-scale, which is exactly why Spark's own graph
  * engine (GraphX/Pregel) is RDD-based. The RDD loop instead:
  *  - hash-partitions the de-duplicated edge table ONCE and persists
  *    it (MEMORY_AND_DISK — spill-safe at scale); every frontier /
  *    level / totals RDD uses the SAME partitioner, so every
  *    per-round join is co-partitioned and NARROW — no edge shuffle,
  *    no broadcast build, no driver collect, ever;
  *  - each round's only wide op is one frontier-scale reduceByKey
  *    (map-side combine caps skewed fan-in);
  *  - phase 1 runs one tiny job per round (the fixpoint count);
  *    phase 2 runs NO per-level job — the sweep is lazy and
  *    materializes inside the single result job, with a lineage-
  *    cutting probe every `eagerStride` levels (persisted-but-
  *    unmaterialized narrow chains recurse task-side; ~8 levels of
  *    depth per stack frame batch is safe where 200 overflows);
  *  - every intermediate persist is tracked and unpersisted on exit
  *    (the pre-r13 DataFrame code leaked ~14 localCheckpoint block
  *    sets per call for the session's lifetime — compounding across
  *    a 160-query bench suite into exactly the monotone cross-round
  *    drift the r12 verdict flagged); the caller receives one
  *    eagerly-checkpointed DataFrame and nothing else stays behind.
  */
object Hierarchy {

  /** All three columns must be INTEGRAL types (byte/short/int/long)
    * — ids join as longs and quantities sum as longs. Validated up
    * front and loudly: a silent cast would truncate fractional
    * quantities (qty 2.5 → 2) and null-drop string ids, returning
    * wrong totals or an empty explosion instead of an error. Callers
    * with decimal quantities should scale to an integer unit (cents,
    * thousandths) first; callers with string ids should dictionary-
    * encode them (a rank join) first.
    */
  private def requireIntegral(df: DataFrame, c: String, what: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$what column '$c' must be an integral type (byte/short/int/long), got " +
        s"${dt.simpleString} — cast or encode it explicitly; an implicit cast " +
        "would silently truncate or null-drop rows")
  }

  /** (node, level, total_qty) for every node reachable from `rootId`
    * (the root itself at level 0, total 1). Parallel edges are
    * summed; rows with a null parent/child/qty are dropped;
    * unreachable nodes are absent. `maxIter` bounds the level
    * fixpoint's rounds (≥ the DAG's depth or the cycle guard fires).
    * Ids and qty must be integral (see `requireIntegral`).
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
    val dbg = sys.env.contains("SPARK_GRAFT_HIERARCHY_DEBUG")
    val t00 = System.nanoTime()
    def mark(tag: String): Unit =
      if (dbg) System.err.println(f"[hier] $tag at ${(System.nanoTime() - t00) / 1e9}%.2f s")
    val eagerStride = 8
    val retired = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    def track[T](rdd: RDD[T]): RDD[T] = {
      retired += rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd
    }
    // Caching does NOT truncate lineage — task serialization walks
    // the full dependency object graph, so per-round RDDs are
    // localCheckpoint-MARKED (lineage cut when first materialized)
    // and a stride count forces materialization on deep BOMs before
    // the graph can overflow the serializer's stack.
    def trackCut[T](rdd: RDD[T]): RDD[T] = {
      retired += rdd.localCheckpoint()
      rdd
    }

    requireIntegral(edges, parentCol, "parent id")
    requireIntegral(edges, childCol, "child id")
    requireIntegral(edges, qtyCol, "quantity")
    val raw = edges.select(
        col(parentCol).cast("long"), col(childCol).cast("long"), col(qtyCol).cast("long"))
      .na.drop()
      .rdd.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val part = new HashPartitioner(math.max(raw.getNumPartitions, 1))
    // parallel edges summed once, then co-located by parent for the
    // per-round narrow joins
    val e = track(raw.reduceByKey(_ + _)
      .map { case ((p, c), q) => (p, (c, q)) }
      .partitionBy(part))

    // Phase 1: levels by worklist longest-path propagation. Each
    // round joins the frontier (nodes whose level just improved)
    // against the co-partitioned edges — narrow — then one
    // frontier-scale reduceByKey(max) and a narrow merge into the
    // level table. Improvements reach a fixpoint in ≤ depth rounds
    // on a DAG; a cycle improves forever → fail fast.
    var levels: RDD[(Long, Long)] =
      track(spark.sparkContext.parallelize(Seq((rootId, 0L))).partitionBy(part))
    var frontier = levels
    var round = 0
    var changed = 1L
    // r17: the fixpoint count is checked every `checkStride` rounds,
    // not every round — each count() is a full driver job whose launch
    // latency dominates at frontier scale (guide §1.2: round count
    // scales with depth, so per-round fixed cost is the lever).
    // Correctness: an empty frontier stays empty (prop of an empty
    // frontier is empty), so improvements cannot resume after a zero —
    // checking late never misses a change, it only runs ≤ stride-1
    // no-op rounds past the fixpoint (narrow empty stages). Each check
    // also materializes the batch, bounding task-side lineage depth
    // like the old per-round count did.
    val checkStride = 3
    while (changed > 0 && round < maxIter) {
      round += 1
      val prop = e.join(frontier)
        .map { case (_, ((c, _), lv)) => (c, lv + 1L) }
        .reduceByKey(part, math.max(_: Long, _: Long))
      val improved = trackCut(prop.leftOuterJoin(levels)
        .filter { case (_, (nl, ol)) => ol.forall(nl > _) }
        .mapValues(_._1))
      levels = trackCut(levels.fullOuterJoin(improved).mapValues {
        case (ol, nl) => math.max(ol.getOrElse(Long.MinValue), nl.getOrElse(Long.MinValue))
      })
      frontier = improved
      if (round % checkStride == 0 || round >= maxIter) {
        changed = improved.count()
        mark(s"p1 round $round changed=$changed")
        if (changed > 0) levels.count() // force the lineage cut
      }
    }
    if (changed > 0) {
      retired.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"levels did not settle in $maxIter rounds — cycle reachable from $rootId?")
    }

    // Phase 2: sweep levels ascending with NO per-level driver
    // action. Every contribution knows its target's level at
    // creation via eLv (edges annotated with the child's settled
    // level, built once), so a settled level's rows leave the
    // carry. All per-level RDDs are persisted and materialize inside
    // the one result job; a stride probe bounds task-side recursion
    // on deep BOMs.
    val depth = levels.map(_._2).fold(0L)(math.max)
    mark(s"p1 done depth=$depth")
    val eLv = track(e
      .map { case (p, (c, q)) => (c, (p, q)) }
      .join(levels, part)
      .map { case (c, ((p, q), lv)) => (p, (c, q, lv)) }
      .partitionBy(part))
    var done: RDD[(Long, Long)] = // id -> total for the level just settled
      track(spark.sparkContext.parallelize(Seq((rootId, 1L))).partitionBy(part))
    val settledByLevel = scala.collection.mutable.ArrayBuffer((0L, done))
    // contributions (child -> (child_level, partial)) to levels not yet settled
    var carry: RDD[(Long, (Long, Long))] =
      spark.sparkContext.emptyRDD[(Long, (Long, Long))]
    for (l <- 1L to depth) {
      val contrib = eLv.join(done) // narrow: both sides on `part`
        .map { case (_, ((c, q, lvc), v)) => (c, (lvc, v * q)) }
      val all = carry.union(contrib)
      val settled = trackCut(all.filter(_._2._1 == l)
        .mapValues(_._2).reduceByKey(part, _ + _))
      carry = trackCut(all.filter(_._2._1 > l))
      done = settled
      settledByLevel += ((l, settled))
      if (l % eagerStride == 0 && l < depth) carry.count() // force the lineage cut
    }

    // The ONE eager job: materializes the sweep, then every
    // intermediate block set is released — nothing outlives the call
    // except the caller's checkpointed result.
    val result = spark.createDataset(
        spark.sparkContext.union(settledByLevel.toSeq.map {
          case (lv, rdd) => rdd.map { case (id, v) => (id, lv, v) }
        }))
      .toDF("node", "level", "total_qty")
      .localCheckpoint()
    mark("result ckpt")
    retired.foreach(_.unpersist(blocking = false))
    result
  }
}
