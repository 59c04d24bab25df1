package graft.multimodal

import graft.SparkSpec

/** Ocr — font separation invariant, clean + one-flip round trips,
  * adversarial two-flip behavior, malformed payloads, and the
  * extractText DataFrame contract with partition invariance.
  */
class OcrSpec extends SparkSpec {

  private val allChars = ('a' to 'z') ++ ('0' to '9')

  test("font: 36 templates, min pairwise Hamming distance >= 3") {
    assert(Ocr.templates.size === 36)
    assert(Ocr.templates.map(_._1) === allChars.sorted)
    assert(Ocr.minPairwiseDist >= 3)
  }

  test("clean render round-trips every glyph with zero distance") {
    val text = allChars.mkString
    // seed chosen irrelevant: render always flips one pixel per glyph,
    // so render a noiseless image by hand from the templates
    val w = Ocr.CellW * text.length
    val rgb = Array.fill[Byte](w * Ocr.CellH * 3)(0xff.toByte)
    for ((ch, i) <- text.zipWithIndex) {
      val mask = Ocr.templates.find(_._1 == ch).get._2
      for (b <- 0 until Ocr.GlyphBits) if ((mask & (1L << b)) != 0L) {
        val x = i * Ocr.CellW + b % 5
        val p = ((b / 5) * w + x) * 3
        rgb(p) = 0; rgb(p + 1) = 0; rgb(p + 2) = 0
      }
    }
    val r = Ocr.recognize(Bmp.encode(w, Ocr.CellH, rgb))
    assert(r.valid && r.text === text && r.dist === 0L)
  }

  test("one flipped pixel per glyph: exact recovery, dist = non-spaces") {
    for (seed <- Seq(0L, 1L, 17L, 9999L, -5L)) {
      val text = "the quick brown fox 0123456789"
      val r = Ocr.recognize(Ocr.render(text, seed))
      assert(r.valid, s"seed $seed")
      assert(r.text === text, s"seed $seed")
      assert(r.dist === text.count(_ != ' ').toLong, s"seed $seed")
    }
  }

  test("every glyph survives every possible single flip position") {
    for (ch <- allChars; flip <- 0 until Ocr.GlyphBits) {
      // one cell, flip at a chosen position: seed solves (seed % 35) == flip
      val r = Ocr.recognize(Ocr.render(ch.toString, seed = flip.toLong))
      assert(r.text === ch.toString && r.dist === 1L, s"char $ch flip $flip")
    }
  }

  test("malformed payloads yield invalid rows, never exceptions") {
    assert(!Ocr.recognize(null).valid)
    assert(!Ocr.recognize(Array[Byte](1, 2, 3)).valid)
    // wrong geometry (height != 7) is rejected, not misread
    val bad = Bmp.encode(6, 5, Array.fill[Byte](6 * 5 * 3)(0))
    assert(!Ocr.recognize(bad).valid)
    // width not a multiple of the cell pitch
    val off = Bmp.encode(7, 7, Array.fill[Byte](7 * 7 * 3)(0))
    assert(!Ocr.recognize(off).valid)
  }

  test("proportional: render/recognize round-trips every glyph and realistic lines") {
    val all = "abcdefghijklmnopqrstuvwxyz0123456789"
    assert(Ocr.recognizeProportional(Ocr.renderProportional(all)).text === all)
    for (t <- Seq("hello world", "menu 42 dollars", "a", "i", "mix 1i1 lil mwm",
                  "spaced  out".replaceAll(" +", " "))) {
      val r = Ocr.recognizeProportional(Ocr.renderProportional(t))
      assert(r.valid && r.dist === 0L && r.text === t, s"'$t' -> '${r.text}'")
    }
  }

  test("proportional widths genuinely vary and segmentation is the decoder") {
    // 'iii' must render strictly narrower than 'mmm' — proportional
    // for real, not fixed-pitch in disguise
    def widthOf(bytes: Array[Byte]): Int =
      Bmp.decodePixels(bytes).map(_._1).getOrElse(0)
    assert(widthOf(Ocr.renderProportional("iii")) < widthOf(Ocr.renderProportional("mmm")))
    // malformed payloads stay a row, never an exception
    assert(!Ocr.recognizeProportional(Array[Byte](1, 2, 3)).valid)
    assert(!Ocr.recognizeProportional(null).valid)
  }

  test("photographic: margin theorem holds and noise amplitude is meaningful") {
    // the exactness proof runs on these two numbers: per-pixel noise
    // ε and cross-char L1 margin M with 96ε < M
    assert(Ocr.PhotoNoise >= 2)
    assert(2 * 48 * Ocr.PhotoNoise < Ocr.photoMargin)
  }

  test("photographic: exact recovery of every glyph at every phase under max noise") {
    // all 36 chars × several seeds — seeds drive both the per-glyph
    // quarter-pixel phase and the pixel noise field
    for (seed <- Seq(0L, 1L, 17L, 9999L, -5L)) {
      val text = allChars.mkString
      val r = Ocr.recognizePhotographic(Ocr.renderPhotographic(text, seed))
      assert(r.valid, s"seed $seed")
      assert(r.text === text, s"seed $seed")
    }
    // every phase value exercised explicitly: one glyph per seed in 0..15
    for (ch <- Seq('i', 'm', 'q', '1'); seed <- 0L until 16L) {
      val r = Ocr.recognizePhotographic(Ocr.renderPhotographic(ch.toString, seed))
      assert(r.text === ch.toString, s"char $ch seed $seed")
    }
  }

  test("photographic: renders are genuinely grayscale and genuinely noisy") {
    val bytes = Ocr.renderPhotographic("antialias", seed = 7L)
    val Some((w, h, rgb)) = Bmp.decodePixels(bytes)
    assert(h === Ocr.PhotoCellH && w === 9 * Ocr.PhotoCellW)
    val grays = (0 until w * h).map(i => rgb(i * 3) & 0xff).toSet
    // a binary render has ≤2 levels; antialiased edges + noise must
    // produce many intermediate sensor values
    assert(grays.size > 10, s"only ${grays.size} gray levels — not photographic")
    assert(grays.exists(g => g > 40 && g < 215), "no intermediate edge coverage values")
    // spaces and malformed payloads behave
    val sp = Ocr.recognizePhotographic(Ocr.renderPhotographic("a b", 3L))
    assert(sp.text === "a b")
    assert(!Ocr.recognizePhotographic(Array[Byte](9, 9)).valid)
    assert(!Ocr.recognizePhotographic(null).valid)
  }

  test("photographic: binarizing at 128 would misread what SAD reads exactly") {
    // the tier is real: for some seed, thresholding the photographic
    // render and running the FIXED-pitch (binary Hamming) classifier
    // on the re-binarized cells disagrees with the source text, while
    // the SAD classifier recovers it — gray evidence matters
    val text = allChars.mkString
    val misread = (0L until 8L).exists { seed =>
      val Some((w, h, rgb)) = Bmp.decodePixels(Ocr.renderPhotographic(text, seed))
      // crop the 7 glyph rows back out and threshold
      val bin = Array.fill[Byte](w * Ocr.CellH * 3)(0xff.toByte)
      for (y <- 0 until Ocr.CellH; x <- 0 until w)
        if ((rgb((y * w + x) * 3) & 0xff) < 128) {
          val p = (y * w + x) * 3
          bin(p) = 0; bin(p + 1) = 0; bin(p + 2) = 0
        }
      val r = Ocr.recognize(Bmp.encode(w, Ocr.CellH, bin))
      r.text != text
    }
    assert(misread, "threshold+Hamming handled every phase — photographic tier not demonstrating gray evidence")
  }

  test("extractTextPhotographic DataFrame contract and partition invariance") {
    import spark.implicits._
    val df = Seq(
      (1L, Ocr.renderPhotographic("menu 42", 1L)),
      (2L, Ocr.renderPhotographic(" ", 2L)),
      (3L, Array[Byte](0, 0))
    ).toDF("doc_id", "payload")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ocr.extractTextPhotographic(d, "doc_id", "payload")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
        .sortBy(_._1).toSeq
    val got = run(df)
    assert(got === Seq(
      (1L, "menu 42", 7L, true),
      (2L, " ", 1L, true),
      (3L, "", 0L, false)))
    assert(run(df.repartition(4)) === got)
  }

  test("extractText contract and partition invariance") {
    import spark.implicits._
    val df = Seq(
      (1L, Ocr.render("menu 42", 1L)),
      (2L, Ocr.render(" ", 2L)),
      (3L, Array[Byte](0, 0))
    ).toDF("doc_id", "payload")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ocr.extractText(d, "doc_id", "payload")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1).toSeq
    val got = run(df)
    assert(got === Seq(
      (1L, "menu 42", 7L, 6L, true),
      (2L, " ", 1L, 0L, true),
      (3L, "", 0L, 0L, false)))
    assert(run(df.repartition(4)) === got)
  }
}
