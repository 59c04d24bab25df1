package graft.streaming

import graft.SparkSpec
import graft.similarity.{GraphAnn, IvfIndex}
import java.nio.file.Files

/** D40 — streaming graph-index maintenance: appended vectors become
  * REACHABLE (reverse edges link the old graph to them), a retry
  * recomputes byte-identical leaves from the pre-batch view, and a
  * planted hub drop fires the rebuild gate while a scattered drop
  * does not.
  */
class StreamingGraphMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16

  // injective over the test id range (mod-257 inner step): the D31
  // generator's period-9 seed cycle made ids 7/16/25 identical
  // vectors, which crowded the k=3 window ahead of the appended copy
  private def vec(seed: Long): Seq[Float] =
    (0 until Dim).map(d => ((seed * 31 + d * 13) % 257 % 9 - 4).toFloat)

  private def jsonl(vs: Seq[(Long, Seq[Float])]): String =
    vs.map { case (id, v) =>
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    }.mkString("\n")

  private def buildIndex(idx: String): Unit = {
    val corpus = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val model = IvfIndex.trainCentroidsQuantized(corpus, dim = Dim, nCentroids = 4)
    val kn = GraphAnn.scaledKnobs(40L)
    val edges = GraphAnn.knnGraph(corpus, model, degree = kn.degree, nprobe = 3)
    GraphAnn.save(corpus, edges, kn, model.scaleBits, idx, srcBuckets = 4)
  }

  test("appended vectors become reachable; retries land byte-identical leaves") {
    val in = Files.createTempDirectory("graft_gmin").toString
    val idx = Files.createTempDirectory("graft_gmidx").toString
    val mon = Files.createTempDirectory("graft_gmmon").toString
    val cp = Files.createTempDirectory("graft_gmcp").toString
    buildIndex(idx)

    // new vectors: exact copies of corpus vectors under NEW ids — the
    // planted probes below must surface them from the appended tier
    val drop0 = Seq((100L, vec(7)), (101L, vec(23)), (102L, vec(31)))
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(drop0))
    StreamingGraphMaintain.start(spark, in, idx, mon, cp).awaitTermination(60000)

    // a query identical to an appended vector must retrieve the new id
    // (dist 0; the original corpus twin ranks first on the id tiebreak)
    val queries = Seq((0L, vec(7)), (1L, vec(23))).toDF("query_id", "embedding")
    val got = GraphAnn.searchSaved(spark, idx, queries, k = 3)
      .select("query_id", "vec_id", "idist")
      .as[(Long, Long, Long)].collect()
    assert(got.filter(_._1 == 0L).exists(r => r._2 == 100L && r._3 == 0L),
      s"query 0 must reach appended node 100: ${got.mkString(", ")}")
    assert(got.filter(_._1 == 1L).exists(r => r._2 == 101L && r._3 == 0L),
      s"query 1 must reach appended node 101: ${got.mkString(", ")}")

    // retry: replaying batch 0 recomputes from the pre-batch view and
    // rewrites only its own leaves — edge content identical
    def edgeSet() = spark.read.parquet(s"$idx/edges")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val before = edgeSet()
    StreamingGraphMaintain.maintainBatch(
      drop0.toDF("vec_id", "embedding"), 0L, idx, mon, 0.2)
    assert(edgeSet() === before, "an at-least-once replay must land identical content")

    val m = spark.read.parquet(mon).where($"batch_no" === 0L).collect().head
    assert(m.getAs[Long]("n_new_nodes") === 3L)
    assert(!m.getAs[Boolean]("rebuild_gate"),
      "three scattered appends must not gate a rebuild")
  }

  test("a hub-shaped drop fires the rebuild gate") {
    val in = Files.createTempDirectory("graft_gmin2").toString
    val idx = Files.createTempDirectory("graft_gmidx2").toString
    val mon = Files.createTempDirectory("graft_gmmon2").toString
    val cp = Files.createTempDirectory("graft_gmcp2").toString
    buildIndex(idx)

    // thirty copies of ONE corpus vector: all their reverse edges
    // concentrate on the same neighborhood — touched degrees blow past
    // 2x the build cap and the overflow fraction trips the gate
    val hub = (200L until 230L).map(i => (i, vec(5)))
    Files.writeString(java.nio.file.Paths.get(in, "d0.jsonl"), jsonl(hub))
    StreamingGraphMaintain.start(spark, in, idx, mon, cp).awaitTermination(60000)

    val m = spark.read.parquet(mon).where($"batch_no" === 0L).collect().head
    assert(m.getAs[Boolean]("rebuild_gate"),
      s"hub drop must gate a rebuild: max_degree=${m.getAs[Long]("max_degree_touched")} " +
        s"overflow=${m.getAs[Double]("overflow_frac")}")
  }
}
