package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch aggregate: structural lower bound (never
  * undercounts), collision-free exactness at generous width, merge
  * associativity across partitionings, and the total-count field.
  */
class CountMinSpec extends SparkSpec {

  private def toks(n: Int, reps: Int) = {
    import spark.implicits._
    (0 until n).flatMap(i => Seq.fill(reps + i % 5)(s"tok$i")).toDF("tok")
  }

  test("estimates never undercount and hit exactly at generous width") {
    CountMin.register(spark)
    val probes = (0 until 20).map(i => s"tok$i")
    val df = toks(20, 3)
    val exact = df.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val row = df.agg(CountMin.cmsEstimates(col("tok"), probes, depth = 4, width = 4096).as("cms"))
      .select(col("cms.n"), col("cms.ests")).head()
    assert(row.getLong(0) == exact.values.sum)
    val ests = row.getSeq[Long](1)
    probes.zip(ests).foreach { case (p, est) =>
      assert(est >= exact(p), s"$p undercounted: $est < ${exact(p)}")
      assert(est == exact(p), s"$p collided at width 4096: $est != ${exact(p)}")
    }
  }

  test("merge is partitioning-invariant") {
    CountMin.register(spark)
    val probes = Seq("tok0", "tok7", "tok19", "absent")
    val df = toks(20, 11)
    def run(parts: Int): Seq[Long] =
      df.repartition(parts)
        .agg(CountMin.cmsEstimates(col("tok"), probes, depth = 4, width = 64).as("cms"))
        .select(col("cms.ests")).head().getSeq[Long](0)
    assert(run(1) == run(8), "estimates must not depend on partitioning")
  }

  test("absent probe estimate is bounded by collisions, never negative") {
    CountMin.register(spark)
    val est = toks(50, 2)
      .agg(CountMin.cmsEstimates(col("tok"), Seq("never-seen"), depth = 4, width = 2048).as("cms"))
      .select(col("cms.ests")).head().getSeq[Long](0).head
    assert(est >= 0L)
    // with 50 distinct tokens in 4×2048 cells, all-4-rows collision is
    // deterministic for this fixed data+hash; assert the documented bound
    val n = toks(50, 2).count()
    assert(est <= n * 8 / 2048 + 1)
  }

  test("raw table agrees with probe estimates cell-for-cell") {
    CountMin.register(spark); CountMin.registerTable(spark)
    val df = toks(20, 3)
    val probes = (0 until 20).map(i => s"tok$i")
    val ests = df.agg(CountMin.cmsEstimates(col("tok"), probes, 4, 256).as("c"))
      .select(col("c.ests")).head().getSeq[Long](0)
    val table = df.agg(CountMin.cmsTable(col("tok"), 4, 256).as("c"))
      .select(col("c.table")).head().getSeq[Long](0)
    // re-derive each probe's min-over-rows from the exported table
    val fromTable = probes.map { p =>
      val f = CmsHash.fingerprint(org.apache.spark.unsafe.types.UTF8String.fromString(p))
      (0 until 4).map(r => table(r * 256 + CmsHash.pos(f, r, 256))).min
    }
    assert(fromTable == ests)
  }

  test("join-size inner product never undercounts and is exact at generous width") {
    CountMin.registerTable(spark)
    import spark.implicits._
    // A: key i appears i+1 times (i<10); B: even keys once each
    val a = (0 until 10).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("k")
    val b = (0 until 10).collect { case i if i % 2 == 0 => s"k$i" }.toDF("k")
    val exact = (0 until 10).collect { case i if i % 2 == 0 => (i + 1).toLong }.sum
    val sa = a.agg(CountMin.cmsTable(col("k"), 4, 4096).as("sa"))
    val sb = b.agg(CountMin.cmsTable(col("k"), 4, 4096).as("sb"))
    val est = sa.crossJoin(sb)
      .select(CountMin.joinSizeEst(col("sa.table"), col("sb.table"), 4, 4096).as("e"))
      .head().getLong(0)
    assert(est >= exact)
    assert(est == exact, s"collision at width 4096: $est != $exact")
    // self-join estimate >= sum of squared frequencies
    val selfExact = (0 until 10).map(i => (i + 1).toLong * (i + 1)).sum
    val selfEst = sa.select(CountMin.joinSizeEst(col("sa.table"), col("sa.table"), 4, 4096).as("e"))
      .head().getLong(0)
    assert(selfEst == selfExact)
  }
}
