package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Stats.equiWidthHistogram — bucket assignment (underflow/overflow/
  * boundaries), per-bucket aggregates, derived bounds, and the 2^53
  * integer-exactness boundary where a double-routed division would
  * mis-bucket.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def hist(vals: Seq[Long], lo: Long, hi: Long, n: Int): Map[Long, Row] =
    Stats.equiWidthHistogram(vals.toDF("v"), col("v"), lo, hi, n)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("bucket assignment: underflow, overflow, inclusive lo / exclusive hi") {
    // [0, 100) in 4 buckets of width 25
    val h = hist(Seq(-5L, 0L, 24L, 25L, 99L, 100L, 150L), lo = 0L, hi = 100L, n = 4)
    assert(h.keySet === Set(-1L, 0L, 1L, 3L, 4L))
    assert(h(-1L).getAs[Long]("n") === 1L) // -5
    assert(h(0L).getAs[Long]("n") === 2L) // 0, 24
    assert(h(1L).getAs[Long]("n") === 1L) // 25
    assert(h(3L).getAs[Long]("n") === 1L) // 99
    assert(h(4L).getAs[Long]("n") === 2L) // 100 (hi is exclusive), 150
  }

  test("derived bounds and aggregates per bucket") {
    val h = hist(Seq(10L, 12L, 30L, 95L), lo = 0L, hi = 100L, n = 4)
    val b0 = h(0L)
    assert(b0.getAs[Long]("lo_cents") === 0L)
    assert(b0.getAs[Long]("hi_cents") === 25L)
    assert(b0.getAs[Long]("n") === 2L)
    assert(b0.getAs[Long]("sum_cents") === 22L)
    assert(b0.getAs[Long]("min_cents") === 10L)
    assert(b0.getAs[Long]("max_cents") === 12L)
    // underflow bucket has null lo bound; overflow has null hi bound
    val hu = hist(Seq(-1L, 100L), lo = 0L, hi = 100L, n = 4)
    assert(hu(-1L).isNullAt(hu(-1L).fieldIndex("lo_cents")))
    assert(hu(4L).isNullAt(hu(4L).fieldIndex("hi_cents")))
    assert(hu(-1L).getAs[Long]("hi_cents") === 0L)
    assert(hu(4L).getAs[Long]("lo_cents") === 100L)
  }

  test("non-divisible range: integer bound math stays consistent with bucket assignment") {
    // span 10 over 3 buckets: assignment floor(v*3/10) implies integer
    // edges CEIL(b*10/3) = 0, 4, 7, 10
    val h = hist(Seq(0L, 2L, 3L, 5L, 6L, 9L), lo = 0L, hi = 10L, n = 3)
    // v=3 -> 9//10 = 0; v=5 -> 15//10 = 1; v=6 -> 18//10=1; v=9 -> 27//10=2
    assert(h(0L).getAs[Long]("n") === 3L) // 0, 2, 3
    assert(h(1L).getAs[Long]("n") === 2L) // 5, 6
    assert(h(2L).getAs[Long]("n") === 1L) // 9
    assert(h(0L).getAs[Long]("hi_cents") === 4L)
    assert(h(1L).getAs[Long]("lo_cents") === 4L)
    assert(h(1L).getAs[Long]("hi_cents") === 7L)
    // every value lies within its bucket's derived [lo, hi) bounds
    h.filterKeys(b => b >= 0 && b < 3).values.foreach { r =>
      assert(r.getAs[Long]("min_cents") >= r.getAs[Long]("lo_cents"))
      assert(r.getAs[Long]("max_cents") < r.getAs[Long]("hi_cents"))
    }
  }

  test("2^53 boundary: long-exact bucketing where double math would misassign") {
    // (v - lo) * n exceeds 2^53 (but not 2^63), so a double-routed
    // division could be off by one ulp and mis-bucket edge-adjacent
    // values; the Long `div` path must split them exactly.
    val lo = 0L
    val hi = 1L << 50
    val n = 1000
    val span = hi - lo
    // smallest v in bucket 499: ceil(499*span/n); 499*span ≈ 5.6e17
    val edge = (499L * span + n - 1) / n
    assert((edge - 1) * n > (1L << 53)) // genuinely beyond double-exact
    assert(((edge - 1) * n) / span === 498L)
    assert((edge * n) / span === 499L)
    val h = hist(Seq(edge - 1, edge), lo, hi, n)
    assert(h(498L).getAs[Long]("n") === 1L)
    assert(h(499L).getAs[Long]("n") === 1L)
    assert(h(498L).getAs[Long]("max_cents") === edge - 1)
    assert(h(499L).getAs[Long]("min_cents") === edge)
    // and the derived edge agrees with the assignment split
    assert(h(499L).getAs[Long]("lo_cents") === edge)
    assert(h(498L).getAs[Long]("hi_cents") === edge)
  }

  test("equi-depth: near-equal populations, brute rank parity, tie determinism") {
    import spark.implicits._
    def run(values: Seq[Long], b: Int, parts: Int = 4): Map[Long, (Long, Long, Long, Long)] =
      Stats.equiDepthHistogram(
          values.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id").repartition(parts),
          col("v"), Seq(col("id")), b)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def brute(values: Seq[Long], b: Int): Map[Long, (Long, Long, Long, Long)] =
      values.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .sortBy(identity).zipWithIndex
        .groupBy { case (_, r) => r.toLong * b / values.size }
        .map { case (k, rows) =>
          val vs = rows.map(_._1._1)
          k -> (vs.size.toLong, vs.min, vs.max, vs.sum)
        }
    // 10 values, 3 buckets: floor-rank split gives sizes 4/3/3
    val tenv = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 10L)
    val got = run(tenv, 3)
    assert(got == brute(tenv, 3))
    assert(got.values.map(_._1).toSeq.sorted == Seq(3L, 3L, 4L))
    // heavy ties: equal values split across buckets deterministically by id
    val ties = Seq.fill(9)(7L) ++ Seq(1L, 2L, 3L)
    assert(run(ties, 4) == brute(ties, 4))
    // partition invariance and more buckets than rows
    assert(run(tenv, 3, parts = 1) == run(tenv, 3, parts = 8))
    assert(run(Seq(5L, 6L), 16).values.map(_._1).sum == 2L)
    intercept[IllegalArgumentException](run(tenv, 0))
  }

  // ------------------------------------------------------- trend fit

  private def fitOne(rows: Seq[(Long, Long)], parts: Int = 4) = {
    import spark.implicits._
    val df = rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y").repartition(parts)
    Stats.trendFit(df, "g", col("x"), col("y"))
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect().head
  }

  test("trendFit recovers an exact line with r2 = 1") {
    val rows = (0L to 20L).map(x => (x, 7L + 3L * x))
    val (n, slope, intercept, r2) = fitOne(rows)
    assert(n === 21L)
    assert(slope === Some(3.0))
    assert(intercept === Some(7.0))
    assert(r2 === Some(1.0))
  }

  test("trendFit matches the closed form on noisy integer data") {
    val rows = (0L until 50L).map(x => (x, 100L + 2L * x + (x * 37 % 11) - 5L))
    val (n, slope, intercept, r2) = fitOne(rows)
    // closed form over exact moments
    val xs = rows.map(_._1.toDouble); val ys = rows.map(_._2.toDouble)
    val sx = xs.sum; val sy = ys.sum
    val sxy = rows.map { case (x, y) => (x * y).toDouble }.sum
    val sxx = rows.map { case (x, _) => (x * x).toDouble }.sum
    val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope.get - expSlope) < 1e-12)
    assert(r2.get > 0.9 && r2.get < 1.0, s"noisy line should have high r2, got $r2")
    assert(math.abs(intercept.get - (sy - slope.get * sx) / n) < 1e-9)
  }

  test("trendFit degenerate groups: zero x-variance nulls, zero y-variance slope 0") {
    val vertical = fitOne(Seq((5L, 1L), (5L, 2L), (5L, 3L)))
    assert(vertical._2.isEmpty && vertical._3.isEmpty && vertical._4.isEmpty)
    val flat = fitOne(Seq((1L, 9L), (2L, 9L), (3L, 9L)))
    assert(flat._2 === Some(0.0))
    assert(flat._3 === Some(9.0))
    assert(flat._4.isEmpty, "r2 is undefined when y never varies")
  }

  test("trendFit is bit-identical under repartitioning (exact integer moments)") {
    val rows = (0L until 200L).map(x => (x, (x * x * 13) % 5000L))
    assert(fitOne(rows, parts = 1) === fitOne(rows, parts = 32))
  }

  // ------------------------------------------------------------ cusum

  /** the textbook sequential recurrences, as ground truth */
  private def seqCusum(xs: Seq[Long], target: Long, slack: Long): (Seq[Long], Seq[Long]) = {
    var sp = 0L; var sn = 0L
    val ps = xs.map { x => sp = math.max(0L, sp + (x - target - slack)); sp }
    val ns = xs.map { x => sn = math.max(0L, sn - (x - target + slack)); sn }
    (ps, ns)
  }

  private def runCusum(xs: Seq[Long], target: Long, slack: Long, parts: Int = 4) = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "i", "x").repartition(parts)
    Stats.cusum(df, "k", Seq(col("i")), col("x"), target, slack)
      .orderBy("i").select("s_pos", "s_neg").as[(Long, Long)].collect().toSeq
  }

  test("cusum prefix closed form equals the sequential recurrence") {
    val xs = Seq[Long](10, 12, 9, 11, 30, 32, 31, 29, 10, 9, 11, 2, 1, 3, 10)
    val (ep, en) = seqCusum(xs, target = 10, slack = 2)
    val got = runCusum(xs, 10, 2)
    assert(got.map(_._1) === ep, "upward CUSUM must match the recurrence")
    assert(got.map(_._2) === en, "downward CUSUM must match the recurrence")
  }

  test("cusum resets at baseline and accumulates drift a z-test misses") {
    // small persistent shift: each value only +3 over target, but the
    // statistic climbs linearly after the changepoint
    val xs = Seq.fill(10)(10L) ++ Seq.fill(10)(13L)
    val got = runCusum(xs, target = 10, slack = 1)
    assert(got.take(10).forall(_._1 === 0L), "at baseline the statistic stays 0")
    assert(got.last._1 === 10L * (13 - 10 - 1), "post-shift drift accumulates (n·(dev−slack))")
    val (ep, _) = seqCusum(xs, 10, 1)
    assert(got.map(_._1) === ep)
  }

  test("cusum is partition-invariant and handles negative prefixes") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(300)(rnd.nextInt(2000).toLong - 1000L)
    val a = runCusum(xs, 0, 50, parts = 1)
    val b = runCusum(xs, 0, 50, parts = 32)
    assert(a === b)
    val (ep, en) = seqCusum(xs, 0, 50)
    assert(a.map(_._1) === ep && a.map(_._2) === en)
  }

  // ---- auc --------------------------------------------------------

  private def aucOf(rows: Seq[(Long, Boolean)], parts: Int = 4): (Long, Long, Long, Double) = {
    val df = rows.toDF("s", "y").repartition(parts)
    val r = Stats.auc(df, col("s"), col("y")).head()
    (r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Double]("auc"))
  }

  test("auc: perfect separation is 1, reversed is 0, all-tied is 0.5") {
    assert(aucOf(Seq((1L, false), (2L, false), (3L, true), (4L, true)))._4 == 1.0)
    assert(aucOf(Seq((1L, true), (2L, true), (3L, false), (4L, false)))._4 == 0.0)
    assert(aucOf(Seq((7L, true), (7L, false), (7L, true), (7L, false)))._4 == 0.5)
  }

  test("auc: tie correction matches the brute-force pair count") {
    val rows = Seq(
      (10L, true), (10L, false), (20L, true), (5L, false), (20L, false),
      (15L, true), (5L, true), (30L, false), (10L, true), (15L, false))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val brute = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    val (nn, np, ng, a) = aucOf(rows)
    assert(nn == 10L && np == pos.size && ng == neg.size)
    assert(a == brute)
    // partition invariance: same bits under any layout
    assert(aucOf(rows, parts = 1)._4 == a && aucOf(rows, parts = 9)._4 == a)
  }

  test("auc: single-class input yields null auc, counts intact") {
    val df = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r = Stats.auc(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  // ---- spearman ---------------------------------------------------

  private def rhoOf(rows: Seq[(Long, Long)], parts: Int = 4): Double = {
    val df = rows.toDF("x", "y").repartition(parts)
    Stats.spearman(df, col("x"), col("y")).head().getAs[Double]("rho")
  }

  /** Reference Spearman via average-tie ranks, straight from the
    * definition (computed with the same doubled-rank integers).
    */
  private def refRho(rows: Seq[(Long, Long)]): Double = {
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1L) }
      sorted.groupBy(_._1).map { case (v, g) =>
        v -> (g.map(_._2).min + g.map(_._2).max)
      }
    }
    val rx = rank2(rows.map(_._1)); val ry = rank2(rows.map(_._2))
    val pts = rows.map { case (a, b) => (BigInt(rx(a)), BigInt(ry(b))) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val syy = pts.map(p => p._2 * p._2).sum
    (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
  }

  test("spearman: monotone ~1, reversed ~-1, ties match the definitional value bitwise") {
    // sqrt(D)*sqrt(D) reproduces D only to within an ulp, so perfect
    // correlation lands a hair inside ±1 — the refRho chain is the
    // bit-exact contract, the magnitude check the semantic one.
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 25L), (7L, 90L))
    assert(rhoOf(mono) == refRho(mono) && rhoOf(mono) > 0.999999)
    val rev = mono.map { case (a, b) => (a, 100L - b) }
    assert(rhoOf(rev) == refRho(rev) && rhoOf(rev) < -0.999999)
    val tied = Seq((1L, 5L), (1L, 7L), (2L, 5L), (3L, 9L), (3L, 2L), (4L, 9L))
    assert(rhoOf(tied) == refRho(tied))
    assert(rhoOf(tied, parts = 1) == rhoOf(tied, parts = 9)) // partition-invariant bits
  }

  test("spearman: a constant side has zero rank variance and yields null") {
    val df = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val r = Stats.spearman(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 3L && r.isNullAt(r.fieldIndex("rho")))
  }

  // ---- ks ----------------------------------------------------------

  private def ksOf(rows: Seq[(Long, Boolean)], parts: Int = 4): (Long, Long, Long, Double) = {
    val df = rows.toDF("v", "ia").repartition(parts)
    val r = Stats.ksTest(df, col("v"), col("ia")).head()
    (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("d_num"),
      r.getAs[Double]("d"))
  }

  /** Brute KS over ECDFs evaluated at every sample value. */
  private def refKs(rows: Seq[(Long, Boolean)]): (Long, Double) = {
    val as = rows.filter(_._2).map(_._1); val bs = rows.filterNot(_._2).map(_._1)
    val dnum = rows.map(_._1).distinct.map { x =>
      math.abs(as.count(_ <= x).toLong * bs.size - bs.count(_ <= x).toLong * as.size)
    }.max
    (dnum, dnum.toDouble / (as.size.toDouble * bs.size.toDouble))
  }

  test("ks: hand case, brute-force parity, identical samples give D = 0") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 -> |2*4 - 0*4| = 8
    val rows = Seq((1L, true), (2L, true), (3L, true), (4L, true),
      (3L, false), (4L, false), (5L, false), (6L, false))
    val (na, nb, dnum, d) = ksOf(rows)
    assert(na == 4L && nb == 4L && dnum == 8L && d == 0.5)
    assert((dnum, d) == refKs(rows))
    val same = Seq(1L, 2L, 2L, 9L).flatMap(v => Seq((v, true), (v, false)))
    assert(ksOf(same)._3 == 0L)
    // noisy case: brute parity + partition invariance of the exact integers
    val noisy = (1L to 60L).map(i => ((i * 37) % 23, i % 3 == 0))
    assert((ksOf(noisy)._3, ksOf(noisy)._4) == refKs(noisy))
    assert(ksOf(noisy, parts = 1) == ksOf(noisy, parts = 11))
  }

  test("ks: an empty side yields null d, counts intact") {
    val r = Stats.ksTest(Seq((1L, true), (2L, true)).toDF("v", "ia"),
      col("v"), col("ia")).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("d")))
  }

  // ---- calibrationBins: the reliability table ----

  private def calib(rows: Seq[(Long, Long, Boolean)], bins: Int = 10,
                    parts: Int = 4): Seq[(Long, Long, Long, Long, Long, Long, Double)] =
    Stats.calibrationBins(
      rows.toDF("s", "t", "y").repartition(parts),
      col("s"), col("t"), col("y"), bins)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .sortBy(_._1).toSeq

  /** Sequential reference: rank by (s, t), bin = rank*bins/n. */
  private def refCalib(rows: Seq[(Long, Long, Boolean)],
                       bins: Int): Seq[(Long, Long, Long, Long, Long, Long, Double)] = {
    val n = rows.size.toLong
    rows.sortBy(r => (r._1, r._2)).zipWithIndex
      .groupBy { case (_, r) => r.toLong * bins / n }
      .toSeq.sortBy(_._1)
      .map { case (bin, g) =>
        val ss = g.map(_._1._1)
        (bin, g.size.toLong, g.count(_._1._3).toLong,
          ss.min, ss.max, ss.sum, g.count(_._1._3).toDouble / g.size)
      }
  }

  test("calibration: hand case — 4 rows in 2 bins, exact evidence per bin") {
    // sorted by (s, t): (1,a,F) (2,b,F) (3,c,T) (5,d,T) → bins {0,1}
    val rows = Seq((3L, 3L, true), (1L, 1L, false), (5L, 4L, true), (2L, 2L, false))
    val got = calib(rows, bins = 2)
    assert(got === Seq(
      (0L, 2L, 0L, 1L, 2L, 3L, 0.0),
      (1L, 2L, 2L, 3L, 5L, 8L, 1.0)))
  }

  test("calibration: equal-depth bins differ by at most one, brute parity") {
    val rows = (1L to 47L).map(i => ((i * 13) % 29, i, i % 3 == 0))
    val got = calib(rows, bins = 10)
    assert(got === refCalib(rows, 10))
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"bin sizes: $sizes")
    assert(sizes.sum === 47L)
  }

  test("calibration: ties split deterministically by the tie-break column") {
    // all scores equal: bin assignment rides entirely on the tie-break
    val rows = (1L to 20L).map(i => (7L, i, i <= 10))
    val got = calib(rows, bins = 2)
    assert(got === Seq(
      (0L, 10L, 10L, 7L, 7L, 70L, 1.0),
      (1L, 10L, 0L, 7L, 7L, 70L, 0.0)))
  }

  test("calibration: partition-invariant bit-for-bit") {
    val rows = (1L to 83L).map(i => ((i * 37) % 50, i, (i * 7) % 5 < 2))
    assert(calib(rows, parts = 1) === calib(rows, parts = 13))
  }

  test("calibration: a perfectly separable scorer yields monotone frac_pos") {
    val rows = (1L to 100L).map(i => (i, i, i > 50))
    val fracs = calib(rows, bins = 10).map(_._7)
    assert(fracs === fracs.sorted, s"not monotone: $fracs")
    assert(fracs.head === 0.0 && fracs.last === 1.0)
  }

  // ---- chiSquare: categorical homogeneity drift ----

  private def chi(rows: Seq[(String, Boolean)], parts: Int = 3)
      : (Long, Long, Long, Long, Option[Double]) = {
    val r = Stats.chiSquare(rows.toDF("c", "ia").repartition(parts),
      col("c"), col("ia")).head()
    (r.getAs[Long]("k_categories"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("df"),
      if (r.isNullAt(r.fieldIndex("chi2"))) None else Some(r.getAs[Double]("chi2")))
  }

  /** Textbook Σ(O−E)²/E over the 2×k table — the definitional form
    * the identity-based fold must agree with (to float tolerance;
    * the operator's own arithmetic is pinned by the oracle).
    */
  private def refChi(rows: Seq[(String, Boolean)]): Double = {
    val cats = rows.map(_._1).distinct
    val na = rows.count(_._2).toDouble
    val nb = rows.size - na
    val n = na + nb
    cats.map { c =>
      val a = rows.count(r => r._1 == c && r._2).toDouble
      val b = rows.count(r => r._1 == c && !r._2).toDouble
      val t = a + b
      val ea = na * t / n; val eb = nb * t / n
      (a - ea) * (a - ea) / ea + (b - eb) * (b - eb) / eb
    }.sum
  }

  test("chi2: hand case — one category fully shifted") {
    // A = {x,x,y,y}, B = {x,x,x,x}: D_x = 2*4-4*4 = -8, D_y = 2*4-0 = 8
    // chi2 = 64/(6*16) + 64/(2*16) = 2/3 + 2 = 8/3
    val rows = Seq(("x", true), ("x", true), ("y", true), ("y", true),
      ("x", false), ("x", false), ("x", false), ("x", false))
    val (k, na, nb, df, chi2) = chi(rows)
    assert(k == 2L && na == 4L && nb == 4L && df == 1L)
    assert(math.abs(chi2.get - 8.0 / 3.0) < 1e-12)
  }

  test("chi2: identical mixes give 0; definitional parity on a noisy table") {
    val same = Seq("a", "b", "b", "c").flatMap(c => Seq((c, true), (c, false)))
    assert(chi(same)._5.get == 0.0)
    val noisy = (1L to 90L).map(i => (s"c${(i * 7) % 5}", i % 3 == 0))
    assert(math.abs(chi(noisy)._5.get - refChi(noisy)) < 1e-9)
  }

  test("chi2: bit-exact partition invariance (ordered fold, not a float sum)") {
    val rows = (1L to 200L).map(i => (s"s${(i * 13) % 7}", (i * 31) % 2 == 0))
    val one = chi(rows, parts = 1)
    val many = chi(rows, parts = 17)
    assert(one == many)
    assert(java.lang.Double.doubleToLongBits(one._5.get) ==
      java.lang.Double.doubleToLongBits(many._5.get))
  }

  test("chi2: an empty side yields null chi2, evidence intact") {
    val (k, na, nb, df, chi2) = chi(Seq(("a", true), ("b", true)))
    assert(k == 2L && na == 2L && nb == 0L && df == 1L && chi2.isEmpty)
  }

  // ---- madOutliers: robust median/MAD flagging ----

  private def refMed(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val num = (s.size - 1) * 50
    val lo = s(num / 100)
    val hi = s(num / 100 + (if (num % 100 > 0) 1 else 0))
    (lo * (100 - num % 100) + hi * (num % 100) + 50) / 100
  }

  private def mad(rows: Seq[(String, Long)], k: Int = 3, parts: Int = 3)
      : Map[String, (Long, Long, Long, Long, Long)] =
    Stats.madOutliers(rows.toDF("g", "v").repartition(parts), col("g"), col("v"), k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("mad: hand cases — odd exact middle, even rounds half-up") {
    val odd = mad(Seq(("a", 1L), ("a", 5L), ("a", 100L)))
    // median 5, devs {4,0,95} -> mad 4, outlier: 95 > 12
    assert(odd("a") == ((3L, 5L, 4L, 1L, 95L)))
    val even = mad(Seq(("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L)))
    // median (2+3+1)/2 = 3 (half-up); devs {2,1,0,1} -> mad (1+1+1)/2 = 1
    assert(even("b")._2 == 3L && even("b")._3 == 1L && even("b")._4 == 0L)
  }

  test("mad: definitional parity on noisy groups; robust where the z-test breaks") {
    // one extreme spike plus a MODERATE outlier: the extreme inflates
    // sigma until the moderate one hides under 3-sigma (masking) —
    // MAD's 50% breakdown point catches both
    val rows = (1L to 90L).map(i => (s"g${i % 2}", (i * 37) % 50)) ++
      Seq(("g0", 100000L), ("g0", 4000L))
    val got = mad(rows)
    Seq("g0", "g1").foreach { g =>
      val xs = rows.filter(_._1 == g).map(_._2)
      val m = refMed(xs)
      val d = refMed(xs.map(x => math.abs(x - m)))
      val out = xs.count(x => math.abs(x - m) > 3 * d)
      assert(got(g) == ((xs.size.toLong, m, d,
        out.toLong, xs.map(x => math.abs(x - m)).max)), s"group $g")
    }
    assert(got("g0")._4 >= 2L, "MAD flags the extreme AND the moderate outlier")
    val xs = rows.filter(_._1 == "g0").map(_._2.toDouble)
    val mean = xs.sum / xs.size
    val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
    val zFlagged = xs.count(x => math.abs(x - mean) > 3 * sigma)
    assert(zFlagged == 1 && math.abs(4000.0 - mean) <= 3 * sigma,
      "the z-test sees only the extreme spike; its own sigma masks the moderate one")
  }

  test("mad: identical values give mad 0, and any deviation then flags") {
    val same = mad(Seq(("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L)))
    assert(same("c") == ((4L, 7L, 0L, 0L, 0L)))
    val spiked = mad(Seq(("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L), ("c", 8L)))
    assert(spiked("c")._3 == 0L && spiked("c")._4 == 1L,
      "dev 1 > 3*0: a zero-MAD group flags any deviation")
  }

  test("mad: bit-exact partition invariance") {
    val rows = (1L to 200L).map(i => (s"p${i % 3}", (i * 13) % 40 + (if (i % 67 == 0) 5000L else 0L)))
    assert(mad(rows, parts = 1) == mad(rows, parts = 17))
  }

  // ---- percentileTable: corpus-percentile normalization ----

  private def pct(xs: Seq[Long], parts: Int = 3): Map[Long, Long] =
    Stats.percentileTable(xs.toDF("v").repartition(parts), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("percentile: hand case with ties — mid-rank basis points") {
    // values 10,20,20,40: avg ranks 1, 2.5, 2.5, 4 -> r2 = 2,5,5,8
    // pct_bp = r2*5000//4 = 2500, 6250, 6250, 10000
    val p = pct(Seq(10L, 20L, 20L, 40L))
    assert(p === Map(10L -> 2500L, 20L -> 6250L, 40L -> 10000L))
  }

  test("percentile: brute mid-rank parity, bounds, partition invariance") {
    val xs = (1L to 150L).map(i => (i * 37) % 40)
    val got = pct(xs)
    val n = xs.size
    val sorted = xs.sorted
    xs.distinct.foreach { v =>
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      assert(got(v) === (lo + hi).toLong * 5000L / n, s"value $v")
    }
    assert(got.values.max <= 10000L && got.values.min > 0L)
    assert(got(sorted.last) === 10000L ||
      sorted.count(_ == sorted.last) > 1, "a unique maximum maps to exactly 10000")
    assert(pct(xs, parts = 1) === pct(xs, parts = 13))
  }
}
