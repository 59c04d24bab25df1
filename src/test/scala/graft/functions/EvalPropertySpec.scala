package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parity for the r14 evaluation tier (fixed-seed raw
  * ScalaCheck, the OperatorPropertySpec pattern): on arbitrary small
  * samples, the distributed AUC / Spearman / KS statistics must equal
  * brute-force references computed straight from the definitions —
  * heavy ties, duplicates, skew and single-value degeneracies
  * included.
  */
class EvalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)).toSeq)

  // small value domain → heavy ties on purpose
  private val scored: Gen[(Long, Boolean)] = for {
    v <- Gen.chooseNum(-5L, 5L)
    y <- Gen.oneOf(true, false)
  } yield (v, y)

  test("auc equals the brute-force pair statistic on arbitrary tied samples") {
    (1 to 8).foreach { round =>
      val rows = samples(scored, 30 + round * 7, seed = round * 1000L)
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val r = Stats.auc(rows.toDF("s", "y").repartition(3 + round % 5),
        col("s"), col("y")).head()
      if (pos.isEmpty || neg.isEmpty) assert(r.isNullAt(r.fieldIndex("auc")))
      else {
        val brute = (for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
        assert(r.getAs[Double]("auc") == brute, s"round $round")
      }
    }
  }

  test("ks equals the brute-force ECDF sup on arbitrary tied samples") {
    (1 to 8).foreach { round =>
      val rows = samples(scored, 30 + round * 7, seed = 90000L + round * 1000L)
      val as = rows.filter(_._2).map(_._1)
      val bs = rows.filterNot(_._2).map(_._1)
      val r = Stats.ksTest(rows.toDF("v", "ia").repartition(2 + round % 6),
        col("v"), col("ia")).head()
      if (as.isEmpty || bs.isEmpty) assert(r.isNullAt(r.fieldIndex("d")))
      else {
        val dnum = rows.map(_._1).distinct.map { x =>
          math.abs(as.count(_ <= x).toLong * bs.size - bs.count(_ <= x).toLong * as.size)
        }.max
        assert(r.getAs[Long]("d_num") == dnum, s"round $round")
        assert(r.getAs[Double]("d") == dnum.toDouble / (as.size.toDouble * bs.size.toDouble))
      }
    }
  }

  private val paired: Gen[(Long, Long)] = for {
    x <- Gen.chooseNum(-4L, 4L)
    y <- Gen.chooseNum(-4L, 4L)
  } yield (x, y)

  test("spearman equals the definitional doubled-rank chain on arbitrary tied samples") {
    (1 to 8).foreach { round =>
      val rows = samples(paired, 25 + round * 5, seed = 50000L + round * 1000L)
      val r = Stats.spearman(rows.toDF("x", "y").repartition(2 + round % 5),
        col("x"), col("y")).head()
      def rank2(vs: Seq[Long]): Map[Long, Long] = {
        val sorted = vs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1L) }
        sorted.groupBy(_._1).map { case (v, g) =>
          v -> (g.map(_._2).min + g.map(_._2).max) }
      }
      val rx = rank2(rows.map(_._1)); val ry = rank2(rows.map(_._2))
      val pts = rows.map { case (a, b) => (BigInt(rx(a)), BigInt(ry(b))) }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val syy = pts.map(p => p._2 * p._2).sum
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (dx == 0 || dy == 0) assert(r.isNullAt(r.fieldIndex("rho")), s"round $round")
      else {
        val brute = (n * sxy - sx * sy).toDouble /
          (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
        assert(r.getAs[Double]("rho") == brute, s"round $round")
      }
    }
  }
}
