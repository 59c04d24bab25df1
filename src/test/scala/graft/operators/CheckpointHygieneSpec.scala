package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The r13 leak contract, pinned: an iterative operator may leave
  * behind ONLY the blocks its returned plan reads — after the caller
  * frees the result, the session's persistent-RDD map must be exactly
  * what it was before the call. (Dataset.unpersist is a no-op for
  * localCheckpoint blocks, so before r13 every one of these operators
  * leaked one block set per round per call for the session's
  * lifetime — the q117 cross-round bench drift.)
  */
class CheckpointHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def leakFree(tag: String)(run: => DataFrame): Unit = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = run
    result.count() // consume like a caller would
    graft.Exec.freeCheckpoint(result)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"$tag left ${leaked.size} persistent RDDs behind: $leaked")
  }

  test("bomExplode leaves no blocks behind") {
    val edges = (1L until 40L).map(i => (i / 3, i, i % 4 + 1))
      .toDF("parent", "child", "qty").repartition(4)
    leakFree("bomExplode")(Hierarchy.bomExplode(edges, rootId = 0L))
  }

  test("hopDistances leaves no blocks behind") {
    val edges = (1L until 40L).map(i => (i / 3, i)).toDF("src", "dst").repartition(4)
    leakFree("hopDistances")(Bfs.hopDistances(edges, Seq(0L).toDF("id")))
  }

  test("connected components leaves no blocks behind") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 9L)).toDF("src", "dst")
    leakFree("components")(graft.dedup.ConnectedComponents.components(edges))
  }

  test("pageRank leaves no blocks behind") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    leakFree("pageRank")(PageRank.ranks(edges, "src", "dst", iters = 5))
  }

  test("kCore leaves no blocks behind") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    leakFree("kCore")(GraphMetrics.kCore(edges, "src", "dst", k = 2))
  }

  test("BPE training leaves no blocks behind (plain-data result)") {
    val docs = Seq("low lower lowest", "new newer newest").toDF("text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val merges = BpeTrainer.train(docs, "text", k = 3)
    assert(merges.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"BPE train left ${leaked.size} persistent RDDs behind")
  }
}
