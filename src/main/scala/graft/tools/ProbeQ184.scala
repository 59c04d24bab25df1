package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage attribution for q184: where do its seconds go — the edge
  * synthesis, the (memoized) label frame, or the modularity DAG's
  * joins/aggregates? Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbeQ184"
  */
object ProbeQ184 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-q184").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
    val nRow = docs.agg(count(lit(1)).as("_n"))
    val base = docs.repartition(32).select(col("doc_id")).crossJoin(broadcast(nRow))
    val cliques = base
      .select(col("doc_id").as("src"), explode(sequence(lit(1L), lit(5L))).as("k"), col("_n"))
      .filter(pmod(col("src"), lit(6)) + col("k") < 6 && col("src") + col("k") < col("_n"))
      .select(col("src"), (col("src") + col("k")).as("dst"))
    val bridges = base
      .filter(pmod(col("doc_id"), lit(29)) === 0 && col("doc_id") + 6 < col("_n"))
      .select(col("doc_id").as("src"), (col("doc_id") + 6).as("dst"))
    val edges = cliques.unionByName(bridges)
    t("edges count")(edges.count())
    t("edges count again")(edges.count())
    val labels = t("propagate (fresh)")(
      graft.operators.LabelPropagation.propagate(edges, iters = 4))
    t("labels count (checkpointed)")(labels.count())
    t("modularity #1")(
      graft.operators.LabelPropagation.modularity(edges, labels).collect())
    t("modularity #2")(
      graft.operators.LabelPropagation.modularity(edges, labels).collect())
    val labCached = labels.cache(); labCached.count()
    val edgesCached = edges.cache(); edgesCached.count()
    t("modularity cached inputs")(
      graft.operators.LabelPropagation.modularity(edgesCached, labCached).collect())
    // sub-DAG attribution with cached inputs
    val e = edgesCached.select(col("src").cast("long").as("_a"),
        col("dst").cast("long").as("_b"))
      .na.drop().filter(col("_a") =!= col("_b"))
    val lab = labCached.select(col("id").cast("long").as("_id"),
      col("label").cast("long").as("_l"))
    t("mRow")(e.agg(count(lit(1))).collect())
    t("deg agg")(e.select(col("_a").as("_id")).unionAll(e.select(col("_b").as("_id")))
      .groupBy("_id").agg(count(lit(1))).count())
    t("dc join+agg")(lab.join(
      e.select(col("_a").as("_id")).unionAll(e.select(col("_b").as("_id")))
        .groupBy("_id").agg(count(lit(1)).as("_dg")), "_id")
      .groupBy("_l").agg(count(lit(1)), sum(col("_dg"))).count())
    t("ec double join")(e
      .join(lab.select(col("_id").as("_a"), col("_l").as("_la")), "_a")
      .join(lab.select(col("_id").as("_b"), col("_l").as("_lb")), "_b")
      .filter(col("_la") === col("_lb"))
      .groupBy(col("_la")).agg(count(lit(1))).count())
    // a plain in-memory labels frame (no RDD lineage): same joins
    val labRows = labCached.collect()
    val labPlain = spark.createDataFrame(
      java.util.Arrays.asList(labRows: _*), labCached.schema)
      .select(col("id").cast("long").as("_id"), col("label").cast("long").as("_l"))
    t("ec double join plain-labels")(e
      .join(labPlain.select(col("_id").as("_a"), col("_l").as("_la")), "_a")
      .join(labPlain.select(col("_id").as("_b"), col("_l").as("_lb")), "_b")
      .filter(col("_la") === col("_lb"))
      .groupBy(col("_la")).agg(count(lit(1))).count())
    spark.stop()
  }
}
