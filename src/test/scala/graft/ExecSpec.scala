package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exec.withCached — cache-release contract and the checkpoint-dir
  * durability switch (reliable checkpoint when a dir is configured,
  * localCheckpoint fallback otherwise).
  */
class ExecSpec extends SparkSpec {
  import spark.implicits._

  test("withCached releases the input cache and returns correct results") {
    val df = (1L to 100L).toDF("v")
    val out = Exec.withCached(df) { d =>
      d.filter(col("v") % 2 === 0).agg(sum(col("v")).as("s"))
    }
    assert(out.as[Long].head() === (2L to 100L by 2).sum)
    // the INPUT's cache entry is gone (the small materialized result
    // legitimately holds its own checkpoint blocks until GC)
    assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "input cache leaked past withCached")
  }

  test("a GraftSession-built session hits the reliable-checkpoint path by default") {
    // getOrCreate returns the suite's active session; GraftSession
    // must give it a checkpoint dir when none is configured, so
    // withCached/CC/PageRank upgrade from localCheckpoint without
    // caller action
    val prior = spark.sparkContext.getCheckpointDir
    try {
      spark.sparkContext.setCheckpointDir(null)
      val s = GraftSession.get()
      assert(s eq spark, "getOrCreate must return the active session")
      val dirOpt = s.sparkContext.getCheckpointDir
      assert(dirOpt.isDefined, "GraftSession must default a checkpoint dir")
      val out = Exec.withCached((1L to 10L).toDF("v"))(_.agg(count(lit(1)).as("n")))
      assert(out.as[Long].head() === 10L)
      def anyFiles(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFiles))
      assert(anyFiles(new java.io.File(new java.net.URI(dirOpt.get).getPath)),
        "withCached under a GraftSession must write reliable checkpoint files")
      // an explicitly configured dir is respected, not replaced
      assert(GraftSession.get().sparkContext.getCheckpointDir === dirOpt)
    } finally spark.sparkContext.setCheckpointDir(prior.orNull)
  }

  test("withCachedChain releases every intermediate and computes through the chain") {
    val a = (1L to 50L).toDF("v")
    val b = a.filter(col("v") % 2 === 0)
    val c = b.withColumn("w", col("v") * 10)
    val out = Exec.withCachedChain(Seq(a, b, c)) {
      // f references MULTIPLE chain members, like GraphMetrics's
      // deg-join-triangles shape
      c.join(b, "v").agg(sum(col("w")).as("s"))
    }
    assert(out.as[Long].head() === (2L to 50L by 2).map(_ * 10).sum)
    for (df <- Seq(a, b, c))
      assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
        "chain cache leaked past withCachedChain")
  }

  test("with a checkpoint dir set, the result is a RELIABLE checkpoint") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val out = Exec.withCached((1L to 10L).toDF("v")) { d =>
        d.agg(count(lit(1)).as("n"))
      }
      assert(out.as[Long].head() === 10L)
      // reliable checkpoints materialize as files under the dir
      def anyFiles(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFiles))
      assert(anyFiles(new java.io.File(dir)),
        s"no reliable checkpoint files written under $dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
