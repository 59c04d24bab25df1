package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q210 (r16 verdict task 3): times corpus
  * count, ivf model, knnGraph build+cache, and the RDD beam search
  * separately under suite-identical wiring (fanOut partitioning).
  */
object ProbeQ210Cost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cost] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { it =>
      println(s"[cost] --- iteration $it")
      val e = graft.Tables.embeddings(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
      val n = t("count")(e.count())
      val model = t("ivfModel")(graft.similarity.IvfIndex.trainCentroidsQuantized(
        e, dim = 64, nCentroids = 8, scaleBits = 10, refinements = 1))
      val kn = graft.similarity.GraphAnn.scaledKnobs(n)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val edges = graft.similarity.GraphAnn.knnGraph(e, model,
        degree = kn.degree, nprobe = 3).persist()
      t("knnGraph build+materialize")(edges.count())
      val res = t("search (RDD rounds)")(
        graft.similarity.GraphAnn.search(e, edges, queries,
          maxLevel = kn.maxLevel, scaleBits = model.scaleBits,
          k = 5, beam = kn.beam, rounds = kn.rounds, entryBeam = kn.entryBeam))
      t("final sort+collect")(res.orderBy("query_id", "rk").collect().length)
      edges.unpersist()
    }
    spark.stop()
  }
}
