package graft

import org.apache.spark.sql.DataFrame

/** Execution-lifecycle helpers shared by operators that branch a
  * computation off a cached intermediate.
  */
object Exec {

  /** Run `f` against a cached copy of `df`, eagerly materializing the
    * result (`localCheckpoint`) so the cache can be released before
    * returning. Callers that would otherwise `persist()` an
    * intermediate and hand back a lazy plan leak the cache for the
    * life of the session — fatal for per-micro-batch callers
    * (StreamingIngest) and bench loops, where cached tables pile up
    * unboundedly. Here the cached input never outlives the call and
    * the caller gets a small, lineage-free result whose blocks the
    * ContextCleaner reclaims on GC.
    *
    * Use only when `f`'s result is much smaller than its input
    * (verified pairs, per-batch verdicts): the result is materialized
    * in executor storage, so a corpus-sized `f` output would trade a
    * cache leak for a storage spike.
    *
    * Cluster-scale caveats, by design: (1) this call is EAGER — the
    * input is materialized and `f` executed before returning, not
    * when the caller first acts on the result; (2) the materialized
    * result's durability depends on the session's checkpoint dir.
    * With `sparkContext.setCheckpointDir` set (any cluster job should
    * point it at durable storage), the result is a RELIABLE
    * checkpoint — executor loss recovers by re-reading the files.
    * Without one it falls back to `localCheckpoint`, which truncates
    * lineage with blocks only in executor storage: fine in local mode
    * (the bench/stream loops this exists for have no executor to
    * lose), unrecoverable after executor loss on a cluster — so set
    * the checkpoint dir there.
    */
  def withCached(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    val cached = df.persist()
    try {
      cached.count() // materialize once before f's branches race
      materialize(f(cached))
    } finally {
      cached.unpersist()
      ()
    }
  }

  /** `withCached` for a CHAIN of intermediates, each an ANCESTOR of
    * the last (that is the caller's contract): caches all of them but
    * materializes with ONE action on the last — computing it fills
    * every ancestor's cache in the same job, where counting each
    * separately would pay one full pass per chain member. Runs `f`
    * against the cached chain and checkpoints the result ONCE —
    * nesting `withCached` would re-checkpoint the result at every
    * level. Same contract as `withCached` otherwise: the result must
    * be much smaller than the cached inputs, and all cache entries
    * are released before returning. (A non-ancestor chain member
    * would merely miss eager materialization — `f`'s first touch
    * fills it then, with at worst benign duplicate partition compute
    * if two branches race.)
    */
  def withCachedChain(dfs: Seq[DataFrame])(f: => DataFrame): DataFrame = {
    require(dfs.nonEmpty, "need at least one intermediate")
    dfs.foreach(_.persist())
    try {
      dfs.last.count()
      materialize(f)
    } finally {
      dfs.reverse.foreach(_.unpersist())
      ()
    }
  }

  private def materialize(result: DataFrame): DataFrame =
    if (result.sparkSession.sparkContext.getCheckpointDir.isDefined) result.checkpoint(true)
    else result.localCheckpoint(true)

  /** Drop the block-manager blocks behind a (local)checkpointed frame.
    * `Dataset.unpersist` only talks to the cache manager and is a
    * silent NO-OP for checkpoint blocks — they live on the RDD inside
    * the plan's LogicalRDD leaf, so an iterative operator that
    * checkpoints per round and never frees leaks one block set per
    * round for the session's lifetime (the q117 cross-round bench
    * drift, adjudicated in r13). Iterative loops must free every
    * retired round frame on exit; only the frame the RETURNED plan
    * reads may survive. Safe on lazy frames — they have no such leaf.
    * Frees EVERY LogicalRDD leaf in the plan — do not pass a frame
    * that shares a checkpoint leaf with a still-live result, or the
    * live frame's blocks silently go with it.
    */
  def freeCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
}
