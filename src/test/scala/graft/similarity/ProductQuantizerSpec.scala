package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ProductQuantizer: code identity for identical vectors, partition
  * invariance, ADC ordering on planted structure, recall@k against
  * exact cosine on clustered data, compression geometry.
  */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated cluster anchors in 8-dim space; 15 members each
  // with a small deterministic per-member nudge on one component.
  private val Dim = 8
  private lazy val clustered: Seq[(Long, Seq[Float])] = {
    val anchors = Seq(
      Seq(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 10f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 0f, 0f, 0f, 10f, 0f))
    for (c <- 0 until 4; i <- 0 until 15) yield {
      val id = (c * 15 + i).toLong
      val v = anchors(c).zipWithIndex.map { case (x, d) =>
        x + (if (d == (i % Dim)) 0.3f * ((i % 3) - 1) else 0f)
      }
      (id, v)
    }
  }

  private lazy val df = clustered.toDF("vec_id", "embedding")
  private lazy val model = ProductQuantizer.train(df, Dim, m = 4, k = 4, refinements = 2)

  test("identical vectors encode identically; codes are partition-invariant") {
    val twice = df.union(df.withColumn("vec_id", col("vec_id") + 1000L))
    val codes = ProductQuantizer.encode(twice, model)
      .select(col("vec_id"), col("pq_code")).as[(Long, Seq[Int])].collect().toMap
    (0L until 60L).foreach(id => assert(codes(id) == codes(id + 1000L)))
    val p1 = ProductQuantizer.encode(df.repartition(1), model)
      .as[(Long, Seq[Float], Seq[Int])].collect().map(r => r._1 -> r._3).toMap
    val p8 = ProductQuantizer.encode(df.repartition(8), model)
      .as[(Long, Seq[Float], Seq[Int])].collect().map(r => r._1 -> r._3).toMap
    assert(p1 == p8)
    assert(p1.values.forall(_.size == 4)) // m codes per vector
  }

  test("ADC: own-cluster codes score closer than far-cluster codes") {
    val enc = ProductQuantizer.encode(df, model)
    val q = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = ProductQuantizer.search(enc, model, q, k = 15)
      .select("vec_id").as[Long].collect().toSet
    // all of cluster 0 (ids 0-14) should rank above any other cluster
    assert(top == (0L until 15L).toSet)
  }

  test("top-5 by ADC stays inside the query's cluster for every cluster") {
    // quantization collapses within-cluster nudges (members share
    // codes, ADC ties break by id) — the PQ-level guarantee is
    // cluster-membership recall, not exact-rank agreement
    val enc = ProductQuantizer.encode(df, model)
    val queries = df.filter(col("vec_id").isin(0L, 15L, 30L, 45L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pq = ProductQuantizer.search(enc, model, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((qid, got) <- pq) {
      val cluster = ((qid / 15) * 15 until (qid / 15) * 15 + 15).toSet
      assert(got.subsetOf(cluster), s"query $qid escaped its cluster: $got")
      assert(got.size == 5)
    }
  }

  test("geometry contracts fail fast") {
    intercept[IllegalArgumentException](ProductQuantizer.train(df, Dim, m = 3, k = 4))
  }

  test("searchProbed equals brute ADC search restricted to the probed buckets") {
    val enc = ProductQuantizer.encode(df, model)
      .withColumn("cid", pmod(col("vec_id"), lit(4)).cast("int"))
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // probe two buckets per query: qid and qid+1 mod 4
    val probes = queries
      .select(col("query_id"), col("embedding").as("_qvec"))
      .withColumn("cid", explode(array((0 until 2).map(i =>
        pmod(col("query_id") + i, lit(4)).cast("int")): _*)))
    val probed = ProductQuantizer.searchProbed(enc, model, probes, k = 5)
      .select("query_id", "rank", "vec_id", "adc_dist")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // reference: brute search over ONLY the vectors in the probed buckets
    val ref = (0L until 4L).flatMap { qid =>
      val buckets = Set(qid % 4, (qid + 1) % 4).map(_.toInt)
      val sub = enc.filter(col("cid").isin(buckets.toSeq: _*))
      ProductQuantizer.search(sub, model,
        queries.filter(col("query_id") === qid), k = 5)
        .select("query_id", "rank", "vec_id", "adc_dist")
        .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    }
    assert(probed === ref)
    // pruning is real: results stay inside probed buckets
    assert(probed.forall { case (qid, _, vid, _) =>
      Set(qid % 4, (qid + 1) % 4).contains(vid % 4) })
  }

  test("quantized PQ: partition-invariant codebooks, scalar replay, integer ADC ordering") {
    // the r15 oracle tier: integer-moments training must be identical
    // whatever the partitioning (what makes q114 hash-oracled)
    val qm1 = ProductQuantizer.trainQuantized(df.repartition(1), Dim, m = 4, k = 4)
    val qm9 = ProductQuantizer.trainQuantized(df.repartition(9), Dim, m = 4, k = 4)
    qm1.books.zip(qm9.books).foreach { case (a, b) =>
      a.centroids.zip(b.centroids).foreach { case ((ca, va), (cb, vb)) =>
        assert(ca === cb && va.sameElements(vb), "codebooks must not depend on partitioning")
      }
    }

    // scalar replay of subspace 0: quantize, seed means, one Lloyd
    // round — must match the distributed codebook bit-exactly
    val sub0 = clustered.map { case (id, v) =>
      (id, v.take(2).map(x => math.floor(x.toDouble * 1024.0).toLong).toArray)
    }
    def means(assign: Map[Long, Int]): Map[Int, Array[Long]] =
      sub0.groupBy { case (id, _) => assign(id) }.map { case (cid, ms) =>
        cid -> Array.tabulate(2)(d => ms.map(_._2(d)).sum / ms.length)
      }
    val seed = means(sub0.map { case (id, _) => id -> (id % 4).toInt }.toMap)
    def nearest(q: Array[Long], cs: Map[Int, Array[Long]]): Int =
      cs.toSeq.map { case (cid, c) =>
        (q.indices.map(d => { val t = q(d) - c(d); t * t }).sum, cid)
      }.min._2
    val refined = means(sub0.map { case (id, q) => id -> nearest(q, seed) }.toMap)
    qm1.books(0).centroids.foreach { case (cid, v) =>
      assert(refined(cid).sameElements(v), s"subspace-0 centroid $cid diverges from scalar replay")
    }

    // integer ADC keeps the planted structure: top-5 stays in-cluster
    val encoded = ProductQuantizer.encodeQuantized(df, qm1)
    val queries = df.filter($"vec_id".isin(0L, 15L, 30L, 45L))
      .select($"vec_id".as("query_id"), $"embedding")
    val top = ProductQuantizer.searchQuantized(encoded, qm1, queries, k = 5)
      .select("query_id", "vec_id", "adc_dist")
      .as[(Long, Long, Long)].collect()
    assert(top.nonEmpty)
    top.foreach { case (qid, vid, d) =>
      assert(qid / 15 === vid / 15, s"query $qid pulled $vid from another cluster")
      assert(d >= 0L)
    }
  }
}
