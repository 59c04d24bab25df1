package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Single-query isolation bench (r13, for adjudicating cross-round
  * drift): runs ONE query N times in a fresh session and prints
  * per-iteration times plus session-state evidence (persistent-RDD
  * count, heap), optionally AGING the session first by running the
  * full suite once — the difference between fresh and aged timings
  * isolates "the operator regressed" from "the session the bench runs
  * it in got heavier as the suite grew across rounds".
  *
  * Usage: sbt "runMain graft.tools.BenchOne <query> [iters] [--age]"
  * (SPARK_GRAFT_SF_DIR selects the scale, default sf0.1).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q117_bom_explode")
    val iters = args.drop(1).headOption.filterNot(_.startsWith("--")).map(_.toInt).getOrElse(3)
    val age = args.contains("--age")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    def runOnce(n: String, f: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def stateLine(tag: String): Unit = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val rt = Runtime.getRuntime
      System.err.println(f"[benchone] $tag: persistentRDDs=${rdds.size} " +
        f"heapUsedMB=${(rt.totalMemory - rt.freeMemory) / 1048576}%d")
    }

    stateLine("fresh")
    if (age) {
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
        try runOnce(n, f) catch { case e: Throwable =>
          System.err.println(s"[benchone] aging $n failed: ${e.getMessage}") }
      }
      System.err.println(f"[benchone] aged by full suite in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      stateLine("aged")
    }
    // one warm-up of the target itself, then timed iterations
    runOnce(name, fn)
    val times = (1 to iters).map(_ => runOnce(name, fn))
    stateLine("done")
    println(s"""{"query":"$name","aged":$age,"times":[${times.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
