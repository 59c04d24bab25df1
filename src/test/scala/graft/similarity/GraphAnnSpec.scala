package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** C117 — graph-ANN (HNSW-style, integer-deterministic): level
  * distribution, bounded degree, partition invariance of the whole
  * chain, beam-search containment (answers come from visited nodes),
  * and recall against exact integer-SSE brute force.
  */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf())
  private lazy val model =
    IvfIndex.trainCentroidsQuantized(e, dim = 64, nCentroids = 8)

  test("levels follow the capped geometric shape and are id-deterministic") {
    val lv = e.select($"vec_id", GraphAnn.levelExpr($"vec_id", 3).as("lvl"))
      .groupBy("lvl").count().as[(Int, Long)].collect().toMap
    val n = lv.values.sum
    assert(lv.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(lv(0) > n / 2, s"level 0 must dominate: $lv")
    assert(lv.getOrElse(3, 0L) > 0, "the entry tier must be non-empty on the fixture")
    assert(lv.getOrElse(3, 0L) < lv(1), s"levels must thin geometrically: $lv")
    // deterministic: identical across recomputation and partitioning
    val lv13 = e.repartition(13)
      .select($"vec_id", GraphAnn.levelExpr($"vec_id", 3).as("lvl"))
      .groupBy("lvl").count().as[(Int, Long)].collect().toMap
    assert(lv13 === lv)
  }

  test("knn graph: degree-bounded, no self loops, neighbors share a probed bucket") {
    val edges = GraphAnn.knnGraph(e, model, degree = 10, nprobe = 3)
    edges.persist()
    try {
      val deg = edges.groupBy("src").count().agg(max("count")).as[Long].head()
      assert(deg <= 10, s"max degree $deg")
      assert(edges.filter($"src" === $"dst").isEmpty, "no self loops")
      // every edge's endpoints share at least one of each other's 3
      // probed buckets (multi-probe membership — the connectivity fix)
      val probed = e.select($"vec_id", explode(
        model.probeExpr(IvfIndex.quantizeExpr($"embedding", model.scaleBits), 3)).as("cid"))
      val shared = edges
        .join(probed.toDF("src", "_ca"), Seq("src"))
        .join(probed.toDF("dst", "_cb"), Seq("dst"))
        .filter($"_ca" === $"_cb")
        .select("src", "dst").distinct()
      assert(shared.count() === edges.select("src", "dst").distinct().count(),
        "every edge must come from a shared probed bucket")
      // and the multi-probe graph is BETTER CONNECTED than the
      // single-bucket one: it must contain cross-assignment edges
      val a1 = e.select($"vec_id",
        model.assignExpr(IvfIndex.quantizeExpr($"embedding", model.scaleBits)).as("cid"))
      val cross = edges
        .join(a1.toDF("src", "_ca"), Seq("src"))
        .join(a1.toDF("dst", "_cb"), Seq("dst"))
        .filter($"_ca" =!= $"_cb")
      assert(cross.count() > 0, "multi-probe membership must link across buckets")
    } finally { edges.unpersist(); () }
  }

  test("search is partition-invariant and answers have non-decreasing integer distance") {
    val queries = e.filter($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding")
    def run(parts: Int) = GraphAnn.search(
      e.repartition(parts), GraphAnn.knnGraph(e.repartition(parts), model),
      queries, maxLevel = 3, scaleBits = model.scaleBits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val one = run(1)
    assert(one.nonEmpty)
    assert(one === run(13), "graph-ANN must not depend on partitioning")
    one.groupBy(_._1).foreach { case (_, rows) =>
      val ds = rows.sortBy(_._2).map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        "ranked distances must be non-decreasing")
    }
  }

  test("recall@5 vs exact integer-SSE brute force is useful") {
    val edges = GraphAnn.knnGraph(e, model)
    val queries = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    val got = GraphAnn.search(e, edges, queries, maxLevel = 3,
      scaleBits = model.scaleBits, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // brute: exact integer SSE over the quantized coordinates
    val xq = e.select($"vec_id", IvfIndex.quantizeExpr($"embedding", model.scaleBits).as("q"))
    val brute = xq.filter($"vec_id" < 10).toDF("qid", "qq")
      .crossJoin(xq.toDF("nid", "nq"))
      .withColumn("d", GraphAnn.intDist($"qq", $"nq"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"nid")))
      .filter($"rk" <= 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.6, s"graph-ANN recall@5 = $recall")
    // and the graph search must not scan the corpus: visited ≤
    // entries + rounds·beam·degree per query ≪ n
    val maxVisited = 3 + 4 * 8 * 10
    assert(got.size <= 10 * 5 && maxVisited < e.count(),
      "beam search touches a bounded frontier, not the corpus")
  }

  test("scaledKnobs staircase: exact values at the fixture sizes, monotone in n") {
    val k500 = GraphAnn.scaledKnobs(500)
    assert(k500 === GraphAnn.Knobs(500, 2, 14, 14, 5, 3))
    val k2000 = GraphAnn.scaledKnobs(2000)
    assert(k2000 === GraphAnn.Knobs(2000, 3, 16, 16, 6, 3))
    val ns = Seq(1L, 16L, 500L, 2000L, 1 << 20, 1L << 40)
    ns.zip(ns.tail).foreach { case (a, b) =>
      val (ka, kb) = (GraphAnn.scaledKnobs(a), GraphAnn.scaledKnobs(b))
      assert(kb.degree >= ka.degree && kb.beam >= ka.beam &&
        kb.rounds >= ka.rounds && kb.maxLevel >= ka.maxLevel,
        s"knobs must grow with n: $a -> $b")
    }
    // entry-set sizing: n/4^maxLevel stays a few dozen until the
    // level cap (15) binds past n ≈ 2^34 — beyond it the entry set
    // grows as n/4^15, still broadcast-trivial at any real corpus
    ns.filter(_ >= 500).foreach { n =>
      val kn = GraphAnn.scaledKnobs(n)
      val frac = n.toDouble / math.pow(4.0, kn.maxLevel)
      assert(frac >= 8 && (frac <= 256 || kn.maxLevel == 15),
        s"expected entry-set size at n=$n: $frac")
    }
  }

  test("scaled knobs hold recall@5 ≥ 0.9 at sf0.1 (r15 verdict: fixed knobs decayed to 0.75)") {
    val e1 = Tables.embeddings(spark, sf("sf0.1")).repartition(4)
    val n = e1.count()
    val kn = GraphAnn.scaledKnobs(n)
    val m1 = IvfIndex.trainCentroidsQuantized(e1, dim = 64, nCentroids = 8)
    val queries = e1.filter($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding")
    val got = GraphAnn.search(e1,
      GraphAnn.knnGraph(e1, m1, degree = kn.degree, nprobe = 3), queries,
      maxLevel = kn.maxLevel, scaleBits = m1.scaleBits, k = 5,
      beam = kn.beam, rounds = kn.rounds, entryBeam = kn.entryBeam, nHint = n)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val xq = e1.select($"vec_id", IvfIndex.quantizeExpr($"embedding", m1.scaleBits).as("q"))
    val brute = xq.filter($"vec_id" < 8).toDF("qid", "qq")
      .crossJoin(xq.toDF("nid", "nq"))
      .withColumn("d", GraphAnn.intDist($"qq", $"nq"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy($"d", $"nid")))
      .filter($"rk" <= 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.9, s"scaled-knob recall@5 at sf0.1 = $recall (probe-measured 1.000)")
  }

  test("save/load round-trip: searchSaved ≡ in-memory search; bucketed edge reads prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gann").toString
    val kn = GraphAnn.scaledKnobs(e.count())
    val edges = GraphAnn.knnGraph(e, model, degree = kn.degree, nprobe = 3).persist()
    try {
      GraphAnn.save(e, edges, kn, model.scaleBits, dir, srcBuckets = 8)
      val queries = e.filter($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding")
      val direct = GraphAnn.search(e, edges, queries, kn.maxLevel, model.scaleBits,
        k = 5, beam = kn.beam, rounds = kn.rounds, entryBeam = kn.entryBeam, nHint = kn.n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val served = GraphAnn.searchSaved(spark, dir, queries)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(served === direct, "a saved index must serve the exact in-memory results")
      // the persisted adjacency prunes on the src bucket (the layout
      // a serving frontier fetch relies on)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val scan = try {
        val q = spark.read.parquet(s"$dir/edges").where($"bucket" === 3)
        q.collect()
        q.queryExecution.executedPlan.collectLeaves()
          .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
          .getOrElse(fail("no FileSourceScanExec in plan"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(scan.partitionFilters.nonEmpty, "bucket filter must prune partitions")
    } finally { edges.unpersist(); () }
  }
}
