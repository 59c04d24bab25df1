package graft.similarity

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf())

  test("brute topk: self is rank 1 with cosine ~1") {
    val q = e.filter($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding")
    val top = CosineTopK.bruteTopK(q, e, dim = 64, k = 5)
    val r1 = top.filter($"rank" === 1)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    r1.foreach { case (qid, vid, cos) =>
      assert(qid == vid, s"rank-1 for $qid was $vid")
      assert(math.abs(cos - 1.0) < 1e-9)
    }
    assert(top.groupBy("query_id").count().select("count").as[Long].collect().forall(_ == 5))
  }

  test("brute topk refuses a query set larger than maxQueries") {
    val q = e.select($"vec_id".as("query_id"), $"embedding") // whole corpus as queries
    val ex = intercept[IllegalArgumentException] {
      CosineTopK.bruteTopK(q, e, dim = 64, k = 5, maxQueries = 10)
    }
    assert(ex.getMessage.contains("IvfIndex"))
    // raising the cap explicitly is the documented escape hatch
    val small = e.filter($"vec_id" < 12).select($"vec_id".as("query_id"), $"embedding")
    assert(CosineTopK.bruteTopK(small, e, dim = 64, k = 1, maxQueries = 12).count() == 12)
  }

  test("searchProbed on deterministic probes matches brute force within probed buckets") {
    val assigned = e.withColumn("cid", pmod($"vec_id", lit(8)).cast("int"))
    val probes = e.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("_qvec"))
      .withColumn("cid", explode(array((0 until 8).map(i => lit(i)): _*))) // probe ALL buckets
    val probedAll = IvfIndex.searchProbed(assigned, probes, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val q = e.filter($"vec_id" < 4).select($"vec_id".as("query_id"), $"embedding")
    val brute = CosineTopK.bruteTopK(q, e, dim = 64, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(probedAll == brute) // probing every bucket == exact search
  }

  test("bucketed near-dup emits ordered pairs above threshold only") {
    val pairs = CosineTopK.bucketedNearDup(e, dim = 64, threshold = 0.3)
    val rows = pairs.select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c) => assert(a < b && c >= 0.3) }
  }

  test("ivf: recall@5 vs brute force is reasonable with nprobe=3/8") {
    val model = IvfIndex.trainCentroids(e, dim = 64, nCentroids = 8, refinements = 1)
    assert(model.centroids.length == 8)
    val assigned = IvfIndex.assign(e, model)
    assert(assigned.select(countDistinct("cid")).as[Long].head() <= 8)
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    val brute = CosineTopK.bruteTopK(q, e, dim = 64, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.search(assigned, model, q, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 = $recall")
    // ivf must actually probe fewer vectors than the corpus
    assert(ivf.size == brute.size)
  }

  test("quantized ivf training: partition-invariant model, exact vs scalar replay, sane recall") {
    // integer-moments training (r15): the model must be IDENTICAL
    // whatever the partitioning — the property that makes q29
    // oracle-replayable
    val m1 = IvfIndex.trainCentroidsQuantized(e.repartition(1), dim = 64, nCentroids = 8)
    val m13 = IvfIndex.trainCentroidsQuantized(e.repartition(13), dim = 64, nCentroids = 8)
    assert(m1.centroids.length === 8)
    m1.centroids.zip(m13.centroids).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca === cb && va.sameElements(vb),
        "quantized centroids must not depend on partitioning")
    }

    // scalar replay of the full round (quantize → seed means → one
    // Lloyd round) must reproduce the distributed model bit-exactly
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val xq = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1024.0).toLong).toArray)
    }
    def meansOf(assign: Map[Long, Int]): Map[Int, Array[Long]] =
      xq.groupBy { case (id, _) => assign(id) }.map { case (cid, members) =>
        val n = members.length
        cid -> Array.tabulate(64)(d => members.map(_._2(d)).sum / n)
      }
    val seed = meansOf(xq.map { case (id, _) => id -> (id % 8).toInt }.toMap)
    def nearest(q: Array[Long], cs: Map[Int, Array[Long]]): Int =
      cs.toSeq.map { case (cid, c) =>
        (q.indices.map(d => { val t = q(d) - c(d); t * t }).sum, cid)
      }.min._2
    val refined = meansOf(xq.map { case (id, q) => id -> nearest(q, seed) }.toMap)
    m1.centroids.foreach { case (cid, v) =>
      assert(refined(cid).sameElements(v), s"centroid $cid diverges from scalar replay")
    }

    // recall through the integer router stays useful (the q29 shape)
    val assigned = e.withColumn("cid",
      m1.assignExpr(IvfIndex.quantizeExpr($"embedding", m1.scaleBits)))
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("_qvec"))
      .withColumn("cid", explode(
        m1.probeExpr(IvfIndex.quantizeExpr($"_qvec", m1.scaleBits), 3)))
    val ivf = IvfIndex.searchProbed(assigned, probes, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    val brute = CosineTopK.bruteTopK(q, e, dim = 64, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"quantized-router recall@5 = $recall")
  }

  test("ivf save/load round-trips the model bit-exact and prunes probe reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val model = IvfIndex.trainCentroids(e, dim = 64, nCentroids = 8, refinements = 1)
    val assigned = IvfIndex.assign(e, model)
    IvfIndex.save(model, assigned, dir)
    val (loaded, loadedAssignments) = IvfIndex.load(spark, dir)

    assert(loaded.dim === model.dim)
    assert(loaded.centroids.length === model.centroids.length)
    model.centroids.zip(loaded.centroids).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca === cb && va.sameElements(vb), "centroids must round-trip bit-exact")
    }

    // identical search results through the persisted index
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    val before = IvfIndex.search(assigned, model, q, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val after = IvfIndex.search(loadedAssignments, loaded, q, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(before === after, "search through the loaded index must be identical")

    // the cid-partitioned layout prunes a single-bucket read to that
    // bucket's partition only — the serve-time probe shape. Asserted
    // on executed-plan scan metrics (inputFiles ignores pruning).
    val nBuckets = loadedAssignments.select(countDistinct("cid")).as[Long].head()
    val oneCid = loadedAssignments.select("cid").as[Int].head()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = loadedAssignments.filter($"cid" === oneCid).groupBy("cid").count()
      q.collect()
      val scan = q.queryExecution.executedPlan
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .headOption.getOrElse(fail("no FileSourceScanExec in plan"))
      val partsRead = scan.metrics.get("numPartitions").map(_.value)
      assert(partsRead.contains(1L),
        s"probe read touched $partsRead of $nBuckets bucket partitions — no pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
