package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH-based ANN serving (the HNSW family — Malkov & Yashunin,
  * TPAMI 2020) re-expressed for a distributed engine with a fully
  * DETERMINISTIC, integer-arithmetic construction (the q200/q29
  * discipline), completing the ANN suite next to brute (q28), IVF
  * (q29/q40), PQ (q114/q119/q176), sign-LSH (q33) and int8 (q200):
  *
  *  - COORDINATES quantize once to floor(x·2^scaleBits) longs
  *    ([[IvfIndex.quantizeExpr]]); every distance below is the exact
  *    integer SSE Σ(a−b)², ties broken by ascending id — no float
  *    anywhere, so the whole structure replays in any engine.
  *  - LEVELS: HNSW draws node levels from a geometric distribution;
  *    the random draw is replaced by the portable md5 fold — level =
  *    trailing base-4 zeros of md5fold(id), capped at `maxLevel`
  *    (P(level ≥ l) = 4^-l, the geometric shape, hash-derived).
  *    Top-level nodes are the ENTRY SET: expected n/4^maxLevel rows,
  *    sized to stay broadcastable by choosing maxLevel ~ log4(n/B)
  *    at corpus scale.
  *  - NEIGHBOR LISTS: HNSW's sequential insert-time graph becomes a
  *    bucketed kNN graph — candidates are pairs sharing an IVF
  *    bucket of the integer-moments coarse quantizer
  *    ([[IvfIndex.trainCentroidsQuantized]]), per-node top-`degree`
  *    by (distance, id). NEVER all-pairs: the bucket join bounds
  *    candidates the way LSH banding bounds q25.
  *  - SEARCH: beam search from the entry set — `rounds` expansion
  *    steps, each joining the current beam against the adjacency
  *    table, keeping the top-`beam` of everything VISITED per query
  *    (monotone frontier: the visited set only grows, so the search
  *    is order-free and replayable round by round). The final top-k
  *    answers come from the visited set.
  *
  * Scale shape: the graph build is one bucket-keyed self-join + one
  * per-node top-k window over bucket-bounded candidates; serving
  * joins a (queries × beam)-sized frontier against the node-keyed
  * adjacency table each round — broadcast-sized left side, partition-
  * prunable right side when the adjacency is persisted bucketed by
  * node.
  */
object GraphAnn {

  /** Node level: trailing base-4 zeros of the md5 fold of the id,
    * capped at `maxLevel` — the geometric level draw of HNSW with the
    * randomness replaced by the engine-portable hash every sampling
    * operator here uses (conv of the first 8 md5 hex chars).
    */
  def levelExpr(id: Column, maxLevel: Int): Column = {
    require(maxLevel >= 1 && maxLevel <= 15, s"maxLevel in [1,15]: $maxLevel")
    val h = conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
    (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(pmod(h, lit(math.pow(4.0, l).toLong)) === 0L, lit(l)).otherwise(acc)
    }
  }

  /** Exact integer SSE between two quantized vectors (arrays of
    * long), the one distance the whole module uses — the NATIVE
    * codegen kernel (r15: the zip_with+aggregate HOF pair evaluated
    * interpreted per element; at candidate-join volume that
    * interpretation dominated q210's cost ~5×). Callers must
    * register via [[graft.functions.LongSseExpressions.register]] —
    * done here lazily on first Column construction.
    */
  def intDist(a: Column, b: Column): Column =
    graft.functions.LongSseExpressions.longSse(a, b)

  /** The bucketed kNN adjacency table: (src, dst, dist) with at most
    * `degree` rows per src — candidates share one of each node's
    * `nprobe` nearest IVF buckets of `model` (MULTI-PROBE membership:
    * single-bucket candidate graphs are DISCONNECTED across bucket
    * boundaries, which strands beam search in the entry's bucket —
    * measured 0.15 recall@5; 3-probe membership links adjacent
    * clusters and lifts the same search to 0.75-0.95); per-src
    * ranking by (dist, dst), self-pairs excluded. Output is the
    * persistable artifact (node-keyed; bucket it by src for pruned
    * serving reads). Candidate count stays bucket-bounded: nprobe×
    * membership over the same bucket count — never all-pairs.
    */
  def knnGraph(vectors: DataFrame, model: IvfIndex.QuantModel,
               idCol: String = "vec_id", vecCol: String = "embedding",
               degree: Int = 10, nprobe: Int = 3): DataFrame = {
    graft.functions.LongSseExpressions.register(vectors.sparkSession)
    val q = IvfIndex.quantizeExpr(col(vecCol), model.scaleBits)
    val nodes = vectors.select(col(idCol).cast("long").as("_id"), q.as("_q"))
      .withColumn("_cid", explode(model.probeExpr(col("_q"), nprobe)))
    val a = nodes.select(col("_cid"), col("_id").as("src"), col("_q").as("_qa"))
    val b = nodes.select(col("_cid"), col("_id").as("dst"), col("_q").as("_qb"))
    val w = Window.partitionBy(col("src")).orderBy(col("dist"), col("dst"))
    a.join(b, Seq("_cid"))
      .filter(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst") // a pair can share several buckets
      .withColumn("dist", intDist(col("_qa"), col("_qb")))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= degree)
      .select(col("src"), col("dst"), col("dist"))
  }

  /** Beam search over a prebuilt adjacency table. `queries` carries
    * (qidCol, vecCol); `nodes` is the corpus (idCol, vecCol); output
    * is (query_id, rk, vec_id, idist) — the top-k of the visited set
    * after `rounds` expansions from the top-`entryBeam` entry nodes.
    * All-integer, id tie-breaks — deterministic by construction.
    */
  def search(nodes: DataFrame, edges: DataFrame, queries: DataFrame,
             maxLevel: Int, scaleBits: Int,
             k: Int = 5, beam: Int = 8, rounds: Int = 4, entryBeam: Int = 3,
             idCol: String = "vec_id", vecCol: String = "embedding",
             qidCol: String = "query_id"): DataFrame = {
    graft.functions.LongSseExpressions.register(nodes.sparkSession)
    val qv = queries.select(col(qidCol).cast("long").as("_qid"),
      IvfIndex.quantizeExpr(col(vecCol), scaleBits).as("_qq"))
    val nv = nodes.select(col(idCol).cast("long").as("_nid"),
      IvfIndex.quantizeExpr(col(vecCol), scaleBits).as("_nq"))
    // entry tier: the level == maxLevel nodes (expected n/4^maxLevel —
    // the broadcastable top of the hierarchy)
    val entries = nv.filter(levelExpr(col("_nid"), maxLevel) === maxLevel)
    val wq = Window.partitionBy(col("_qid")).orderBy(col("_d"), col("_nid"))
    var visited = qv.crossJoin(broadcast(entries))
      .withColumn("_d", intDist(col("_qq"), col("_nq")))
      .withColumn("_r", row_number().over(wq))
      .filter(col("_r") <= entryBeam)
      .select(col("_qid"), col("_nid"), col("_d"))
    val adj = edges.select(col("src").as("_nid"), col("dst"))
    // free-on-exit contract (the r13 iterative-operator rule —
    // Exec.freeCheckpoint): every per-round checkpoint is retired
    // once the eager final result exists, else each search call
    // leaks `rounds` block sets for the session's lifetime (the
    // BOM-explosion aging pattern; measured: the bench's later
    // iterations inflated 2× as leaked sets accumulated)
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 0
    while (r < rounds) {
      val beamFront = visited
        .withColumn("_r", row_number().over(
          Window.partitionBy(col("_qid")).orderBy(col("_d"), col("_nid"))))
        .filter(col("_r") <= beam)
        .select(col("_qid"), col("_nid"))
      val expanded = beamFront
        .join(adj, Seq("_nid"))
        .select(col("_qid"), col("dst").as("_nid"))
        .join(qv, Seq("_qid"))
        .join(nv, Seq("_nid"))
        .withColumn("_d", intDist(col("_qq"), col("_nq")))
        .select(col("_qid"), col("_nid"), col("_d"))
      // materialize each round (query-scale rows): round r references
      // round r-1 TWICE (beam + union), so a lazy chain re-plans and
      // re-executes 2^rounds copies of the whole upstream — the same
      // reason the DuckDB oracle marks its round layers MATERIALIZED
      visited = visited.unionByName(expanded)
        .groupBy(col("_qid"), col("_nid")).agg(min(col("_d")).as("_d"))
        .localCheckpoint(true)
      retired += visited
      r += 1
    }
    val result = visited
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_qid")).orderBy(col("_d"), col("_nid"))))
      .filter(col("_r") <= k)
      .select(col("_qid").as(qidCol), col("_r").cast("long").as("rk"),
        col("_nid").as(idCol), col("_d").as("idist"))
      .localCheckpoint(true) // eager, k×queries rows — then free the rounds
    retired.foreach(graft.Exec.freeCheckpoint)
    result
  }
}
