package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qprobe] $tag%-28s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r
    }
    // warm
    SparkEntry.queries("q100_setsim_join")(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { _ =>
      val d = Tables.documents(spark, sfDir).repartition(32)
        .select(col("doc_id"), graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
      val sets0 = t("sets0 checkpoint") {
        d.select(col("doc_id").as("id"), array_distinct(col("sh")).as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") > 0)
          .localCheckpoint()
      }
      val tok = sets0.select(col("id"), col("n"), explode(col("toks")).as("tok"))
      val freq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      val rank = freq
        .repartitionByRange(col("df"), col("tok"))
        .sortWithinPartitions("df", "tok")
        .select(col("tok"), monotonically_increasing_id().as("r"))
      val sets = t("sets checkpoint") {
        tok.join(rank, "tok").groupBy("id", "n")
          .agg(sort_array(collect_list(col("r"))).as("rord"))
          .localCheckpoint()
      }
      t("rest (prefix+verify+sort)") {
        graft.dedup.SetSimJoin.join(
          Tables.documents(spark, sfDir).repartition(32)
            .select(col("doc_id"), graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh")),
          "doc_id", "sh", 1, 2).write.format("noop").mode("overwrite").save()
      }
      sets0.unpersist(); sets.unpersist()
    }
    spark.stop()
  }
}
