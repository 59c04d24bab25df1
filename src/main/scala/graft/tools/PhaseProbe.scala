package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Split a query's wall time into build (DataFrame construction +
  * analysis), plan (optimizer + physical planning), and exec (the
  * noop-sink run, which includes AQE replanning) — guide §1: know
  * whether a slow query is execution-bound or driver/planning-bound
  * before touching the operators.
  *
  * Usage: sbt "runMain graft.tools.PhaseProbe <q1,q2,...> [iters]"
  * (SPARK_GRAFT_SF_DIR selects the scale, default sf0.1).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up: one full run so JIT/codegen/listing caches are hot
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[probe] $name warmup failed: ${e.getMessage}") }
      val rows = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val build = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces optimization + physical planning
        val plan = ms(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val exec = ms(t2)
        (build, plan, exec)
      }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      println(f"$name%-28s build ${med(rows.map(_._1))}%8.1f ms  plan ${med(rows.map(_._2))}%8.1f ms  exec ${med(rows.map(_._3))}%8.1f ms")
    }
    spark.stop()
  }
}
