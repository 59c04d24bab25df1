package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L).map(i => (i, s"w$i text ${i % 7}")).toDF("doc_id", "text")

  test("same (seed, epoch) reproduces the identical permutation; different epochs differ") {
    val a = EpochShuffle.assign(docs, "doc_id", seed = 42L, epoch = 1, nShards = 4)
      .orderBy("h").select("doc_id").as[Long].collect().toSeq
    val b = EpochShuffle.assign(docs, "doc_id", seed = 42L, epoch = 1, nShards = 4)
      .orderBy("h").select("doc_id").as[Long].collect().toSeq
    val c = EpochShuffle.assign(docs, "doc_id", seed = 42L, epoch = 2, nShards = 4)
      .orderBy("h").select("doc_id").as[Long].collect().toSeq
    val d = EpochShuffle.assign(docs, "doc_id", seed = 7L, epoch = 1, nShards = 4)
      .orderBy("h").select("doc_id").as[Long].collect().toSeq
    assert(a === b, "determinism")
    assert(a !== c, "epochs reshuffle")
    assert(a !== d, "seeds reshuffle")
    assert(a.sorted === (0L until 400L), "permutation: every doc exactly once")
  }

  test("shards partition the corpus disjointly and roughly evenly") {
    val sizes = EpochShuffle.assign(docs, "doc_id", 42L, 1, 4)
      .groupBy("shard").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.sum === 400L)
    sizes.values.foreach(n => assert(n > 50 && n < 150, s"skewed shard: $sizes"))
  }

  test("manifest order_md5 equals a reader consuming the shard in order") {
    val m = EpochShuffle.manifest(docs, "doc_id", "text", 42L, 1 to 1, 2)
      .collect().map(r => r.getLong(1) -> r.getString(4)).toMap
    val shard0 = EpochShuffle.assign(docs, "doc_id", 42L, 1, 2)
      .filter(col("shard") === 0L).orderBy("h", "doc_id")
      .select("doc_id").as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    shard0.foreach(id => md.update(id.toString.getBytes("UTF-8")))
    val expect = md.digest().map(x => f"${x & 0xff}%02x").mkString
    assert(m(0L) === expect, "certificate pins the consumption order")
  }
}
