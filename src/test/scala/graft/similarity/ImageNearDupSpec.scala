package graft.similarity

import graft.SparkSpec
import graft.multimodal.Bmp

/** ImageNearDup — the aHash definition against a brute-force replay,
  * shift-invariance (the property that forces spatially-varying test
  * patterns), band recall guarantees, and the banded pair join.
  */
class ImageNearDupSpec extends SparkSpec {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((f(x, y) % 256) + 256) % 256
      val p = (y * w + x) * 3
      rgb(p) = v.toByte; rgb(p + 1) = v.toByte; rgb(p + 2) = v.toByte
    }
    rgb
  }

  // independent replay of the definition
  private def bruteHash(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val cw = w / 8; val ch = h / 8
    val cells = for (cy <- 0 until 8; cx <- 0 until 8) yield {
      (for (y <- cy * ch until (cy + 1) * ch; x <- cx * cw until (cx + 1) * cw) yield {
        val p = (y * w + x) * 3
        (77 * (rgb(p) & 0xff) + 150 * (rgb(p + 1) & 0xff) + 29 * (rgb(p + 2) & 0xff)) >> 8
      }).map(_.toLong).sum
    }
    val total = cells.sum
    cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c * 64 >= total) acc | (1L << (63 - i)) else acc
    }
  }

  test("aHash equals the brute-force definition; gray luma is the raw value") {
    for (seed <- 0 until 8) {
      val rgb = gray(16, 16)((x, y) => 7 * x * y + 3 * x + (5 + seed) * y + seed * seed)
      assert(ImageNearDup.aHash64(16, 16, rgb).get === bruteHash(16, 16, rgb))
    }
    // a non-gray image too (luma weights exercised)
    val rgb = new Array[Byte](16 * 16 * 3)
    for (i <- rgb.indices) rgb(i) = ((i * 37 + 11) % 256).toByte
    assert(ImageNearDup.aHash64(16, 16, rgb).get === bruteHash(16, 16, rgb))
  }

  test("aHash is invariant to constant luma shifts (why patterns must vary spatially)") {
    val a = gray(16, 16)((x, y) => 9 * x * y + x + 2 * y)
    val b = gray(16, 16)((x, y) => 9 * x * y + x + 2 * y + 50)
    // the +50 shift wraps some pixels past 255, so only compare where it doesn't
    val bNoWrap = gray(16, 16)((x, y) => (9 * x * y + x + 2 * y) % 200 + 50)
    val aSame = gray(16, 16)((x, y) => (9 * x * y + x + 2 * y) % 200)
    assert(ImageNearDup.aHash64(16, 16, aSame).get ===
      ImageNearDup.aHash64(16, 16, bNoWrap).get)
    assert(a.length === b.length) // silence unused warnings
  }

  test("misaligned dimensions and bad payloads are skipped") {
    assert(ImageNearDup.aHash64(12, 16, new Array[Byte](12 * 16 * 3)).isEmpty)
    assert(ImageNearDup.aHash64(16, 16, new Array[Byte](7)).isEmpty)
    assert(ImageNearDup.aHash64(0, 0, Array.emptyByteArray).isEmpty)
  }

  test("pairs: near-dups found via bands, verified by exact Hamming") {
    val s = spark
    import s.implicits._
    def img(f: (Int, Int) => Int): Array[Byte] = Bmp.encode(16, 16, gray(16, 16)(f))
    val base: (Int, Int) => Int = (x, y) => 5 * x * y + 3 * x + y
    val docs = Seq(
      (0L, img(base)),
      (1L, img((x, y) => base(x, y) + (if ((x + y * 16) % 51 == 0) 40 else 0))), // near 0
      (2L, img((x, y) => 11 * x * y + 7 * x + 13 * y)), // unrelated
      (3L, img(base)), // exact dup of 0
      (4L, Array.fill[Byte](30)(1))) // undecodable: contributes nothing
      .toDF("doc_id", "payload").repartition(3)
    val out = ImageNearDup.pairs(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact dup pair has hamming 0
    assert(out((0L, 3L)) === 0L)
    // the perturbed twin is close to both copies of the base
    assert(out.contains((0L, 1L)) && out((0L, 1L)) <= 10L)
    assert(out((0L, 1L)) === out((1L, 3L)))
    // hamming values equal the brute-force xor popcount
    val h = Map(
      0L -> bruteHash(16, 16, gray(16, 16)(base)),
      1L -> bruteHash(16, 16, gray(16, 16)((x, y) => base(x, y) + (if ((x + y * 16) % 51 == 0) 40 else 0))),
      2L -> bruteHash(16, 16, gray(16, 16)((x, y) => 11 * x * y + 7 * x + 13 * y)),
      3L -> bruteHash(16, 16, gray(16, 16)(base)))
    out.foreach { case ((a, b), d) =>
      assert(d === java.lang.Long.bitCount(h(a) ^ h(b)).toLong, s"pair ($a,$b)")
    }
    // pigeonhole: any pair within hamming <= 3 MUST be found
    for (((a, b), d) <- out if d <= 3) assert(out.contains((a, b)))
  }

  // independent replay of the wHash definition (median threshold)
  private def bruteWHash(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val cw = w / 8; val ch = h / 8
    val cells = for (cy <- 0 until 8; cx <- 0 until 8) yield {
      (for (y <- cy * ch until (cy + 1) * ch; x <- cx * cw until (cx + 1) * cw) yield {
        val p = (y * w + x) * 3
        (77 * (rgb(p) & 0xff) + 150 * (rgb(p + 1) & 0xff) + 29 * (rgb(p + 2) & 0xff)) >> 8
      }).map(_.toLong).sum
    }
    val sorted = cells.sorted
    val m2 = sorted(31) + sorted(32)
    cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c * 2 > m2) acc | (1L << (63 - i)) else acc
    }
  }

  test("wHash equals the brute-force median-threshold definition") {
    for (seed <- 0 until 8) {
      val rgb = gray(16, 16)((x, y) => 7 * x * y + 3 * x + (5 + seed) * y + seed * seed)
      assert(ImageNearDup.wHash64(16, 16, rgb).get === bruteWHash(16, 16, rgb))
    }
  }

  test("wHash requires power-of-two cell sizes (Haar band contract)") {
    // 24×24 is 8-aligned (cells 3×3) — valid for aHash, NOT a Haar band
    val rgb24 = gray(24, 24)((x, y) => x * y + x)
    assert(ImageNearDup.aHash64(24, 24, rgb24).isDefined)
    assert(ImageNearDup.wHash64(24, 24, rgb24).isEmpty)
    assert(ImageNearDup.wHash64(16, 16, gray(16, 16)((x, y) => x + y)).isDefined)
  }

  test("median threshold survives extreme outliers that drag the mean") {
    // smooth gradient (the photo-like shape: many cells near the
    // threshold): cell value v = cx + 8·cy, spacing 4 sum-units
    val base = gray(16, 16)((x, y) => (x / 2) + 8 * (y / 2))
    // four corner blocks blasted to 255 (the lens-flare/watermark
    // class): the mean moves 14 cell-positions, the median at most 4
    def corner(x: Int, y: Int) = (x < 2 || x >= 14) && (y < 2 || y >= 14)
    val hot = gray(16, 16)((x, y) => if (corner(x, y)) 255 else (x / 2) + 8 * (y / 2))
    val aFlips = java.lang.Long.bitCount(
      ImageNearDup.aHash64(16, 16, base).get ^ ImageNearDup.aHash64(16, 16, hot).get)
    val wFlips = java.lang.Long.bitCount(
      ImageNearDup.wHash64(16, 16, base).get ^ ImageNearDup.wHash64(16, 16, hot).get)
    // hand-computed: aHash flips 16 bits (14 mid-gradient cells cross
    // the dragged mean + 2 dark corners), wHash flips 4 (2 dark
    // corners + the ≤2 cells the 4-position median step crosses)
    assert(wFlips === 4, s"wHash flips: $wFlips")
    assert(aFlips === 16, s"aHash flips: $aFlips")
  }

  test("wPairs finds planted twins and is partitioning-invariant") {
    val s = spark
    import s.implicits._
    def img(f: (Int, Int) => Int): Array[Byte] = Bmp.encode(16, 16, gray(16, 16)(f))
    val base: (Int, Int) => Int = (x, y) => 5 * x * y + 3 * x + y
    val docs = Seq(
      (0L, img(base)),
      (1L, img((x, y) => if ((x * 16 + y) % 67 == 0) 255 else base(x, y))),
      (2L, img((x, y) => 11 * x * y + 7 * x + 13 * y)),
      (3L, img(base))).toDF("doc_id", "payload")
    val out = ImageNearDup.wPairs(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 3L)) === 0L)
    assert(out.contains((0L, 1L)) && out((0L, 1L)) <= 10L)
    val p1 = ImageNearDup.wPairs(docs.repartition(1)).orderBy("id_a", "id_b")
      .collect().map(_.toString).toSeq
    val p5 = ImageNearDup.wPairs(docs.repartition(5)).orderBy("id_a", "id_b")
      .collect().map(_.toString).toSeq
    assert(p1 === p5)
  }

  test("pairs are partitioning-invariant") {
    val s = spark
    import s.implicits._
    def img(seed: Int): Array[Byte] =
      Bmp.encode(16, 16, gray(16, 16)((x, y) => (3 + seed) * x * y + x + seed * y))
    val docs = (0L until 12L).map(i => (i, img((i / 2).toInt)))
    val a = ImageNearDup.pairs(docs.toDF("doc_id", "payload").repartition(1))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    val b = ImageNearDup.pairs(docs.toDF("doc_id", "payload").repartition(5))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty) // the shared-seed twins collide by construction
  }
}
