package graft.tools
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val s = graft.functions.LmQuality.scoreDocuments(d)
    s.describe("mean_p", "n_pairs", "n_oov_ctx", "n_seen").show()
    s.selectExpr("approx_percentile(mean_p, array(0.05,0.1,0.25,0.5,0.75,0.9,0.95)) as q").show(false)
    spark.stop()
  }
}
