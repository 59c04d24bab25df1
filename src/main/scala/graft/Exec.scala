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
    * when the caller first acts on the result; (2) localCheckpoint
    * truncates lineage WITHOUT replication, so on a multi-executor
    * cluster losing an executor after the call makes the result
    * unrecoverable (block-fetch failure instead of recompute). In
    * local mode — the bench/stream loops this exists for — there is
    * no executor to lose; on a real cluster, callers that need fault
    * tolerance should write the small result to a table (a reliable
    * checkpoint) and read it back instead, exactly as the MinHashLsh
    * scaladoc prescribes for corpus-scale signature reuse.
    */
  def withCached(df: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    val cached = df.persist()
    try {
      cached.count() // materialize once before f's branches race
      f(cached).localCheckpoint(true)
    } finally {
      cached.unpersist()
      ()
    }
  }
}
