package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query benchmark (no suite warm-up, 3 iterations,
  * median/min/max): `sbt "runMain graft.tools.IsoBench q50_profile"`.
  * Isolates a query from suite-JVM effects when a full Bench number
  * looks off.
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    val qs = SparkEntry.queries
    names.foreach { n => qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save() } // warm
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ISO $n%-26s median=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
