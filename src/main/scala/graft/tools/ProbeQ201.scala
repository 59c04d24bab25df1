package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution probe for q201_host_neardup (r15 adjudication):
  * times each pipeline tier of MinHashLsh.groupNearDuplicates in
  * isolation — per-doc signatures, the per-host distinct base table,
  * host signature merge + banding, and the intersection/verify tail —
  * so the suite cost is attributable to named work, not guessed.
  * Mirrors the q201 fixture exactly.
  */
object ProbeQ201 {
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
    graft.functions.ShingleFunctions.register(spark)

    val d = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val primary = d.select(pmod(col("doc_id"), lit(40)).as("host"), col("text"))
    val partial = d
      .filter(pmod(col("doc_id"), lit(40)) === 7 && pmod(col("doc_id"), lit(11)) =!= 0)
      .select(lit(40L).as("host"), col("text"))
    val full = d.filter(pmod(col("doc_id"), lit(40)) === 13)
      .select(lit(41L).as("host"), col("text"))
    val docs = primary.unionByName(partial).unionByName(full)
    val cfg = graft.dedup.MinHashLsh.Config(wordShingles = true)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { it =>
      println(s"[probe] --- iteration $it ---")
      val sel = docs.select(col("host").as("_grp"), col("text").as("_t"))
      val pd = graft.dedup.MinHashLsh.signatures(sel, "_grp", "_t", cfg)
      pd.persist()
      t("signatures (per doc)") { pd.count() }
      val baseRows = pd.select(col("_grp"), explode(col("_bases")).as("_b")).distinct()
      baseRows.persist()
      val nb = t("baseRows distinct") { baseRows.count() }
      val merged = t("host sig merge (plan+exec)") {
        val m = pd.select(col("_grp"), posexplode(col("sig")).as(Seq("_i", "_h")))
          .groupBy(col("_grp"), col("_i")).agg(min(col("_h")).as("_h"))
          .groupBy(col("_grp"))
          .agg(transform(array_sort(collect_list(struct(col("_i"), col("_h")))),
            x => x("_h")).as("sig"))
        m.persist(); m.count(); m
      }
      val pairs = t("banding + candidate pairs") {
        val p = graft.dedup.MinHashLsh.candidatePairsFromSignatures(merged, "_grp", cfg)
        p.persist(); p.count(); p
      }
      t("intersect + verify tail") {
        val sizes = baseRows.groupBy("_grp").agg(count(lit(1)).as("_n"))
        val inter = baseRows.toDF("id_a", "_b")
          .join(pairs, Seq("id_a"))
          .join(baseRows.toDF("id_b", "_b"), Seq("id_b", "_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"))
        pairs.join(inter, Seq("id_a", "id_b"), "left")
          .na.fill(0L, Seq("_inter"))
          .join(sizes.toDF("id_a", "_na"), Seq("id_a"))
          .join(sizes.toDF("id_b", "_nb"), Seq("id_b"))
          .count()
      }
      println(s"[probe] baseRows=$nb")
      Seq(pd, baseRows, merged, pairs).foreach(_.unpersist())
    }
    spark.stop()
  }
}
