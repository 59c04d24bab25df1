package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ZOrderLayout — shift-mask interleave vs a bit-by-bit reference,
  * the prefix/cell identity `zBucket(morton(x,y)) == morton(x>>s,
  * y>>s)`, and the layout's partition pruning asserted on scan
  * metrics with result parity against an unpartitioned filter.
  */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)) }

  test("column morton2, driver mortonLong, and the bit-by-bit reference agree") {
    // md5-deterministic sample of the 16-bit × 16-bit domain + corners
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      (1 to 200).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"zorder/$i".getBytes("UTF-8"))
        def u16(o: Int) = ((h(o) & 0xffL) << 8) | (h(o + 1) & 0xffL)
        (u16(0), u16(2))
      }
    val out = pts.toDF("x", "y")
      .withColumn("z", ZOrderLayout.morton2(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((x, y, z) <- out) {
      assert(z === mortonRef(x, y), s"column morton2 mismatch at ($x,$y)")
      assert(z === ZOrderLayout.mortonLong(x, y), s"driver twin mismatch at ($x,$y)")
    }
  }

  test("cell identity: zBucket(morton(x,y)) == morton of the prefixes") {
    val p = 3
    val s = 16 - p
    for ((x, y) <- Seq((12345L, 54321L), (0L, 65535L), (40000L, 1L))) {
      val bucket = ZOrderLayout.mortonLong(x, y) >> (2 * s)
      assert(bucket === ZOrderLayout.mortonLong(x >> s, y >> s))
    }
  }

  test("rankBuckets: monotone, in range, near-even on skewed data, morton-compatible") {
    // heavy skew: 90% of values in [0, 100), long tail to 10^6
    val vals = (0L until 2000L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rb/$i".getBytes("UTF-8"))
      val u = ((h(0) & 0xffL) << 8) | (h(1) & 0xffL)
      if (i % 10 != 0) u % 100L else u * 15L
    }
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = ZOrderLayout.rankBuckets(df, "v", bits = 4)
      .select("v", "v_bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (_, b) => b >= 0L && b <= 15L })
    assert(out.map(_._2).max === 15L, "top bucket must be populated")
    // monotone: sort by value, buckets never decrease
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // near-even despite skew: no bucket holds more than 4x its share
    val sizes = out.groupBy(_._2).view.mapValues(_.size).values
    assert(sizes.max <= 4 * (2000 / 16), s"skewed bucket sizes: $sizes")
    assert(out.map(_._2).max < 65536L, "bucket ids must be valid morton dims")
  }

  test("writeRanked/readRawBox: raw skewed dims end-to-end, pruned and exact") {
    // x skewed (90% small, long tail), y uniform — raw domains far
    // beyond 16 bits
    val rows = (0L until 3000L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rr/$i".getBytes("UTF-8"))
      def u16(o: Int) = ((h(o) & 0xffL) << 8) | (h(o + 1) & 0xffL)
      val x = if (i % 10 != 0) u16(0) % 500L else u16(0) * 1000L
      (i, x, u16(2) * 3L)
    }
    val df = rows.toDF("id", "x", "y")
    val dir = Files.createTempDirectory("graft_zranked").toString + "/t"
    val (bx, by) = ZOrderLayout.writeRanked(df, "x", "y", dir, bits = 6, prefixBits = 3)
    assert(bx.length === 63 && by.length === 63)

    val (x0, x1, y0, y1) = (0.0, 400.0, 30000.0, 90000.0)
    val got = ZOrderLayout.readRawBox(spark, dir, "x", "y", x0, x1, y0, y1, bx, by)
      .select("id").as[Long].collect().toSet
    val expected = rows.filter(r => r._2 <= 400L && r._3 >= 30000L && r._3 <= 90000L)
      .map(_._1).toSet
    assert(got === expected, "raw-coordinate read must return exactly the box")
    assert(expected.size > 100, "degenerate box — test data broken")

    // pruning: the skewed-x slice is dense in rank space but still
    // bounded; the read must not touch every cell
    val totalCells = spark.read.parquet(dir).select("z_bucket").distinct().count()
    val readCells = ZOrderLayout.readRawBox(spark, dir, "x", "y", x0, x1, y0, y1, bx, by)
      .select("z_bucket").distinct().count()
    assert(readCells < totalCells, s"no pruning: $readCells of $totalCells cells")
  }

  test("a 2D box reads only its intersecting cells; results match a plain filter") {
    // 64 × 64 deterministic grid of points, both dims uniform
    val rows = (0L until 4096L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pt/$i".getBytes("UTF-8"))
      def u16(o: Int) = ((h(o) & 0xffL) << 8) | (h(o + 1) & 0xffL)
      (i, u16(0), u16(2))
    }
    val df = rows.toDF("id", "x", "y")
    val dir = Files.createTempDirectory("graft_zorder").toString + "/t"
    val p = 3
    ZOrderLayout.write(df, "x", "y", dir, p)

    // thin slice in x, full range in y: a LINEAR x-sorted layout
    // serves this well but a LINEAR y-sorted one reads everything —
    // z-order serves both; this box touches 2 of 64 cells per row of
    // the x-strip = 2 * 8 cells
    val (x0, x1, y0, y1) = (8192L, 24575L, 0L, 65535L)
    val buckets = ZOrderLayout.boxBuckets(x0, x1, y0, y1, p)
    assert(buckets.size === 16, s"8192..24575 spans 2 x-prefixes × 8 y-prefixes: $buckets")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (got, scan) = try {
      val q = ZOrderLayout.readBox(spark, dir, "x", "y", x0, x1, y0, y1, p)
      val res = q.select("id").as[Long].collect().toSet
      val sc = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec in plan"))
      (res, sc)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    val expected = rows.filter(r => r._2 >= x0 && r._2 <= x1 && r._3 >= y0 && r._3 <= y1)
      .map(_._1).toSet
    assert(got === expected, "pruned read must return exactly the box")
    assert(expected.nonEmpty, "degenerate box — test data broken")

    assert(scan.partitionFilters.nonEmpty, "bucket IN-filter must prune at listing")
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
      .getOrElse(fail("no numPartitions metric"))
    assert(partsRead <= buckets.size.toLong,
      s"read $partsRead cells for a ${buckets.size}-cell box")
    val totalParts = spark.read.parquet(dir).select("z_bucket").distinct().count()
    assert(partsRead < totalParts,
      s"no pruning: $partsRead of $totalParts cells read")
  }
}
