package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 10000L).toDF("id")

  test("split proportions approximate the weights over many keys") {
    val counts = keys.select(Sampling.splitLabel(col("id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5)).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 9000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 150, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 500L) < 150, s"test=${counts("test")}")
    assert(counts.values.sum == 10000L)
  }

  test("membership is invariant under repartitioning (unlike rand-based sample)") {
    val a = keys.select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    val b = keys.repartition(17).select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("smaller sample percentages are strict subsets of larger ones") {
    val s5 = keys.filter(Sampling.sampledBy(col("id"), 5)).as[Long].collect().toSet
    val s20 = keys.filter(Sampling.sampledBy(col("id"), 20)).as[Long].collect().toSet
    assert(s5.subsetOf(s20))
    assert(s5.nonEmpty && s20.size > s5.size)
  }

  test("weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.splitLabel(col("id"), Seq("train" -> 80, "val" -> 10))
    }
  }

  test("token budget keeps the greedy hash-order prefix, per group, reproducibly") {
    val df = (1L to 100L).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
      .withColumn("n_tokens", lit(10L) + col("doc_id") % 7)
    val out = Sampling.tokenBudgetSelect(df, "lang", "doc_id", "n_tokens", budget = 100L)
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("kept")))
    // kept mass per group is within budget; adding any dropped doc would overflow
    Seq("en", "de").foreach { g =>
      val grp = rows.filter(_._2 == g).sortBy(_._4)
      val keptMass = grp.filter(_._5).map(_._3).sum
      assert(keptMass <= 100L && keptMass > 0L, s"$g kept $keptMass")
      val firstDropped = grp.find(!_._5).get
      assert(keptMass + firstDropped._3 > 100L ||
        firstDropped._4 > 100L, s"$g prefix not greedy")
      // cumulative sums are consistent: cum = running sum in cum order
      assert(grp.map(_._3).scanLeft(0L)(_ + _).tail.toSeq == grp.map(_._4).toSeq)
    }
    // determinism under repartitioning
    val again = Sampling.tokenBudgetSelect(df.repartition(13), "lang", "doc_id", "n_tokens", 100L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("kept"))).toMap
    assert(rows.map(r => r._1 -> r._5).toMap == again)
  }

  test("domain cap keeps exactly `cap` docs per domain, hash-ranked") {
    val df = (1L to 60L).toDF("doc_id")
      .withColumn("source", concat(lit("host_"), col("doc_id") % 4))
    val out = Sampling.domainCap(df, "source", "doc_id", cap = 3)
    val kept = out.filter(col("kept")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id"))
    assert(kept.groupBy(_._1).forall(_._2.length == 3))
    // ranks are 1..n and dense within each domain
    val ranks = out.collect().groupBy(_.getAs[String]("source"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("domain_rank")).sorted.toSeq }
    assert(ranks.forall(r => r == (1L to r.length).toSeq))
    // deterministic under repartitioning
    val again = Sampling.domainCap(df.repartition(7), "source", "doc_id", 3)
      .filter(col("kept")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id")).toSet
    assert(kept.toSet == again)
  }

  test("stratified keep rates apply per stratum and stay hash-deterministic") {
    val df = (1L to 4000L).toDF("id")
      .withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val kept = df.filter(Sampling.stratifiedKeep(col("id"), col("lang"), Seq("en" -> 25)))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("de") == 2000L)                       // default 100%
    assert(math.abs(kept("en") - 500L) < 120, s"en=${kept("en")}") // ~25%
    // the kept 25% is a subset of the flat 25% sample on the same key
    val strat = df.filter(col("lang") === "en")
      .filter(Sampling.stratifiedKeep(col("id"), col("lang"), Seq("en" -> 25)))
      .select("id").as[Long].collect().toSet
    val flat = df.filter(col("lang") === "en")
      .filter(Sampling.sampledBy(col("id"), 25)).select("id").as[Long].collect().toSet
    assert(strat == flat)
  }

  test("temperature T=2 keep rebalances domains toward sqrt proportions") {
    // three domains with 16:4:1 token mass — after T=2 smoothing the
    // kept masses should approach 4:2:1 (sqrt), i.e. keep rates
    // 1/4, 1/2, 1 (p_d = sqrt(min/domain))
    val df = (1L to 21000L).toDF("id")
      .withColumn("dom", when(col("id") <= 16000, "big")
        .when(col("id") <= 20000, "mid").otherwise("small"))
    val dom = df.groupBy("dom").agg(count(lit(1)).as("domain_tokens"))
    val mn = dom.agg(min("domain_tokens").as("min_tokens"))
    val kept = df.join(dom, "dom").crossJoin(mn)
      .filter(Sampling.temperatureKeepT2(col("id"), col("domain_tokens"), col("min_tokens")))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 1000L, "smallest domain must keep everything")
    assert(math.abs(kept("mid") - 2000L) < 200, s"mid=${kept("mid")} want ~4000*1/2")
    assert(math.abs(kept("big") - 4000L) < 300, s"big=${kept("big")} want ~16000*1/4")
    // partitioning-invariant
    val again = df.repartition(7).join(dom, "dom").crossJoin(mn)
      .filter(Sampling.temperatureKeepT2(col("id"), col("domain_tokens"), col("min_tokens")))
      .count()
    assert(again == kept.values.sum)
  }

  // ------------------------------------------------- priority sampling

  private def prioFixture(n: Int, heavy: Set[Long], heavyW: Long, lightW: Long) =
    (1L to n.toLong).map(id =>
      ("s", id, if (heavy(id)) heavyW else lightW)).toDF("g", "id", "w")

  test("prioritySample returns exactly k rows per stratum with rank order by priority") {
    val df = (1L to 50L).map(id => (if (id % 2 == 0) "a" else "b", id, id)).toDF("g", "id", "w")
    val out = Sampling.prioritySample(df, "g", "id", "w", k = 5)
      .select("stratum", "sample_rank", "key", "pr", "tau")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.count(_._1 == "a") === 5 && out.count(_._1 == "b") === 5)
    for (s <- Seq("a", "b")) {
      val rows = out.filter(_._1 == s).sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to 5L), "ranks must be 1..k")
      assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq,
        "priorities must descend with rank")
      val tau = rows.head._5
      assert(rows.forall(_._5 === tau), "tau is a per-stratum constant")
      assert(tau > 0.0 && rows.forall(_._4 >= tau),
        "tau is the excluded (k+1)-th priority — below every sampled one")
    }
  }

  test("prioritySample: tau is 0 when the stratum has at most k rows") {
    val df = Seq(("s", 1L, 10L), ("s", 2L, 20L)).toDF("g", "id", "w")
    val out = Sampling.prioritySample(df, "g", "id", "w", k = 5)
      .select("sample_rank", "tau").as[(Long, Double)].collect()
    assert(out.length === 2)
    assert(out.forall(_._2 === 0.0))
  }

  test("heavier rows are sampled far more often (weight-proportional inclusion)") {
    // 100 rows, 5 heavy (w=1000) vs 95 light (w=1): across 40 seeds,
    // the heavy rows should almost always make the k=10 sample while
    // any individual light row rarely does
    val heavy = Set(7L, 23L, 41L, 68L, 90L)
    val df = prioFixture(100, heavy, 1000L, 1L).cache()
    var heavyIn = 0L
    var lightIn = 0L
    for (s <- 0 until 40) {
      val picked = Sampling.prioritySample(df, "g", "id", "w", k = 10, seed = s"seed$s")
        .select("key").as[Long].collect().toSet
      heavyIn += picked.count(heavy)
      lightIn += picked.count(id => !heavy(id))
    }
    val heavyRate = heavyIn.toDouble / (40 * 5)
    val lightRate = lightIn.toDouble / (40 * 95)
    assert(heavyRate > 0.95, s"heavy rows must nearly always be sampled ($heavyRate)")
    assert(lightRate < 0.12, s"light rows must be rare ($lightRate)")
  }

  test("DLT estimator: sum of max(w, tau) over the sample tracks the true mass") {
    val heavy = Set(3L, 9L)
    val df = prioFixture(60, heavy, 500L, 10L).cache()
    val trueMass = 2 * 500L + 58 * 10L
    val ests = (0 until 30).map { s =>
      Sampling.prioritySample(df, "g", "id", "w", k = 12, seed = s"est$s")
        .select(greatest(col("weight").cast("double"), col("tau")).as("c"))
        .as[Double].collect().sum
    }
    val mean = ests.sum / ests.size
    assert(math.abs(mean - trueMass) / trueMass < 0.15,
      s"DLT estimate mean $mean vs true $trueMass")
  }

  test("prioritySample is invariant under repartitioning") {
    val df = (1L to 200L).map(id => ("s", id, 1L + id % 7)).toDF("g", "id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.prioritySample(d, "g", "id", "w", k = 8)
        .select("sample_rank", "key", "tau").as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(13)))
  }
}
