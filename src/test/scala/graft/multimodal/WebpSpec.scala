package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** VP8L reader checked two ways: (a) hand-built bitstreams assembled
  * bit-by-bit from the spec text (no shared code with our writer —
  * these pin the reader against the DOCUMENT), and (b) encoder
  * round-trips across the full knob space (transform combinations,
  * cache, LZ77). PlaneCodes' closed-form generation is pinned
  * against sampled entries of the spec's printed table.
  */
class WebpSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def gradient(w: Int, h: Int): Array[Int] =
    pixels(w, h)((x, y) => (0xff << 24) | (((x * 7 + y) % 256) << 16) |
      (((x + y * 5) % 256) << 8) | ((x * 3 + y * 11) % 256))

  private def roundTrip(w: Int, h: Int, px: Array[Int],
                        sg: Boolean = false, pred: Boolean = false,
                        pal: Boolean = false, cache: Int = 0, lz: Boolean = false): Unit = {
    val bytes = Webp.encode(w, h, px, subtractGreen = sg, predictor = pred,
      palette = pal, cacheBits = cache, lz77 = lz)
    val out = Webp.decodePixels(bytes)
    assert(out.isDefined, s"decode failed (sg=$sg pred=$pred pal=$pal cache=$cache lz=$lz)")
    val (dw, dh, dp) = out.get
    assert(dw === w && dh === h)
    assert(dp.toSeq === px.toSeq, s"pixels (sg=$sg pred=$pred pal=$pal cache=$cache lz=$lz)")
  }

  test("round trips: plain literals, every transform knob, cache, lz77") {
    val g = gradient(33, 17)
    roundTrip(33, 17, g)
    roundTrip(33, 17, g, sg = true)
    roundTrip(33, 17, g, pred = true)
    roundTrip(33, 17, g, sg = true, pred = true)
    roundTrip(33, 17, g, cache = 6)
    roundTrip(33, 17, g, cache = 11)
    // runs exercise LZ77 + cache insertion on copies
    val runs = pixels(40, 9)((x, y) => (0xff << 24) | (((x / 13) * 40 + y * 3) << 8))
    roundTrip(40, 9, runs, lz = true)
    roundTrip(40, 9, runs, lz = true, cache = 4)
    roundTrip(40, 9, runs, sg = true, pred = true, cache = 5, lz = true)
    // palettes at every packing width: 2, 4, 16, 256 colors
    def palImg(colors: Int, w: Int, h: Int) =
      pixels(w, h)((x, y) => (0xff << 24) | (((x * 31 + y * 17) % colors) * (255 / colors) << 8))
    roundTrip(31, 7, palImg(2, 31, 7), pal = true)
    roundTrip(31, 7, palImg(4, 31, 7), pal = true)
    roundTrip(31, 7, palImg(16, 31, 7), pal = true)
    roundTrip(19, 11, palImg(200, 19, 11), pal = true)
    // 1x1 and single-row/column edges
    roundTrip(1, 1, Array(0xff102030))
    roundTrip(7, 1, gradient(7, 1), pred = true)
    roundTrip(1, 9, gradient(1, 9), pred = true)
    // alpha variation
    val alpha = pixels(9, 9)((x, y) => ((x * 29 + y * 37) % 256) << 24 | 0x00804020)
    roundTrip(9, 9, alpha, cache = 4)
  }

  test("hand-built bitstream: five single-symbol simple codes, zero bits per pixel") {
    // Assembled bit-by-bit per spec, LSB-first. Image 3x2, every code
    // simple/1-symbol so all six pixels decode with no further reads:
    // green=5, red=7, blue=9, alpha=0xff, dist=0.
    val bits = new StringBuilder // in read order
    def put(v: Int, n: Int): Unit =
      (0 until n).foreach(i => bits.append((v >> i) & 1))
    put(3 - 1, 14); put(2 - 1, 14) // w-1, h-1
    put(0, 1); put(0, 3) // alpha hint, version
    put(0, 1) // no transforms
    put(0, 1) // no color cache
    put(0, 1) // no meta image
    def simple1(sym: Int): Unit = {
      put(1, 1) // simple
      put(0, 1) // one symbol
      if (sym <= 1) { put(0, 1); put(sym, 1) } else { put(1, 1); put(sym, 8) }
    }
    simple1(5); simple1(7); simple1(9); simple1(0xff); simple1(0)
    // pack LSB-first into bytes
    val payload = bits.toString.grouped(8).map { g =>
      g.zipWithIndex.map { case (c, i) => (c - '0') << i }.sum.toByte
    }.toArray
    val vp8l = (0x2f.toByte +: payload)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); u32(4 + 8 + vp8l.length + (vp8l.length & 1))
    out.write("WEBP".getBytes); out.write("VP8L".getBytes); u32(vp8l.length)
    out.write(vp8l); if ((vp8l.length & 1) == 1) out.write(0)
    val res = Webp.decodePixels(out.toByteArray)
    assert(res.isDefined, "hand-built stream must decode")
    val (w, h, px) = res.get
    assert(w === 3 && h === 2)
    assert(px.toSeq === Seq.fill(6)(0xff070509), "ARGB = (ff, 07, 05, 09)")
  }

  test("hand-built bitstream: two-symbol simple green code selects per pixel") {
    // 4x1; green code = simple 2 symbols {1, 4} (1 bit per pixel),
    // other channels single-symbol. Pixel greens: 1, 4, 4, 1.
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits.append((v >> i) & 1))
    put(3, 14); put(0, 14); put(0, 1); put(0, 3)
    put(0, 1); put(0, 1); put(0, 1) // no transforms, no cache, no meta
    put(1, 1); put(1, 1) // green: simple, two symbols
    put(1, 1); put(1, 8) // first symbol 8-bit: 1
    put(4, 8) // second symbol: 4
    def simple1(sym: Int): Unit = {
      put(1, 1); put(0, 1)
      if (sym <= 1) { put(0, 1); put(sym, 1) } else { put(1, 1); put(sym, 8) }
    }
    simple1(0); simple1(0); simple1(0xff); simple1(0) // red, blue, alpha, dist
    // canonical: symbol 1 → code 0, symbol 4 → code 1 (ascending)
    put(0, 1); put(1, 1); put(1, 1); put(0, 1) // greens 1, 4, 4, 1
    val payload = bits.toString.grouped(8).map { g =>
      g.zipWithIndex.map { case (c, i) => (c - '0') << i }.sum.toByte
    }.toArray
    val vp8l = (0x2f.toByte +: payload)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); u32(4 + 8 + vp8l.length + (vp8l.length & 1))
    out.write("WEBP".getBytes); out.write("VP8L".getBytes); u32(vp8l.length)
    out.write(vp8l); if ((vp8l.length & 1) == 1) out.write(0)
    val res = Webp.decodePixels(out.toByteArray)
    assert(res.isDefined)
    val (_, _, px) = res.get
    assert(px.map(p => (p >>> 8) & 0xff).toSeq === Seq(1, 4, 4, 1))
  }

  test("hand-built bitstream: meta prefix image selects per-tile code groups") {
    // 8x1 image, huffman_bits = 2 → 4-pixel tiles → a 2x1 meta image
    // whose (red<<8|green) pixels pick groups 0 and 1; both groups are
    // all-single-symbol so tile membership fully determines pixels.
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits.append((v >> i) & 1))
    def simple1(sym: Int): Unit = {
      put(1, 1); put(0, 1)
      if (sym <= 1) { put(0, 1); put(sym, 1) } else { put(1, 1); put(sym, 8) }
    }
    put(7, 14); put(0, 14); put(0, 1); put(0, 3) // 8x1, hint, version
    put(0, 1) // no transforms
    put(0, 1) // no color cache (main)
    put(1, 1) // meta prefix image present
    put(0, 3) // huffman_bits - 2 = 0 → 4-pixel tiles
    // --- meta subimage (2x1, entropy-coded, not main): cache bit, 5 codes
    put(0, 1) // no cache
    put(1, 1); put(1, 1) // green: simple, 2 symbols
    put(0, 1); put(0, 1) // first symbol 1-bit: 0
    put(1, 8) // second symbol: 1
    simple1(0); simple1(0); simple1(0xff); simple1(0) // red, blue, alpha, dist
    put(0, 1); put(1, 1) // meta pixels: greens 0 then 1 → groups 0, 1
    // --- two groups of five codes
    simple1(5); simple1(1); simple1(2); simple1(0xff); simple1(0) // group 0
    simple1(9); simple1(3); simple1(4); simple1(0xff); simple1(0) // group 1
    // pixels: zero further bits (all single-symbol)
    val payload = bits.toString.grouped(8).map { g =>
      g.zipWithIndex.map { case (c, i) => (c - '0') << i }.sum.toByte
    }.toArray
    val vp8l = (0x2f.toByte +: payload)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); u32(4 + 8 + vp8l.length + (vp8l.length & 1))
    out.write("WEBP".getBytes); out.write("VP8L".getBytes); u32(vp8l.length)
    out.write(vp8l); if ((vp8l.length & 1) == 1) out.write(0)
    val res = Webp.decodePixels(out.toByteArray)
    assert(res.isDefined, "meta-group stream must decode")
    val (_, _, px) = res.get
    assert(px.toSeq === (Seq.fill(4)(0xff010502) ++ Seq.fill(4)(0xff030904)),
      "first tile group (r=1,g=5,b=2), second tile group (r=3,g=9,b=4)")
  }

  test("PlaneCodes closed form matches the spec's printed table at sampled entries") {
    val pc = Webp.PlaneCodes
    assert(pc.length === 120)
    // first sixteen entries as printed in the spec
    assert(pc.take(16).toSeq === Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3)))
    // spot entries deeper in the table
    assert(pc(22) === ((0, 4)) && pc(23) === ((4, 0)))
    assert(pc(34) === ((0, 5)))
    assert(pc(96) === ((8, 0)))
    assert(pc(119) === ((8, 7)))
    // every offset is above-or-left and unique
    assert(pc.toSet.size === 120)
    assert(pc.forall { case (dx, dy) => dy > 0 || dx > 0 })
  }

  test("malformed inputs never throw") {
    assert(Webp.decode(Array.emptyByteArray).valid === false)
    assert(Webp.decode("RIFFxxxxWEBP".getBytes).valid === false)
    assert(Webp.decode(Array.fill[Byte](64)(0x41)).valid === false)
    val good = Webp.encode(5, 5, gradient(5, 5))
    assert(Webp.decode(good).valid)
    (1 until good.length by 7).foreach { cut =>
      Webp.decode(good.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val flipped = good.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      Webp.decode(flipped) // must not throw; valid may be either
    }
  }

  test("decode stats aggregate matches pixels") {
    val px = gradient(12, 5)
    val info = Webp.decode(Webp.encode(12, 5, px, cacheBits = 5))
    assert(info.valid && info.width === 12 && info.height === 5)
    assert(info.sumR === px.map(p => (p >>> 16) & 0xff).map(_.toLong).sum)
    assert(info.sumG === px.map(p => (p >>> 8) & 0xff).map(_.toLong).sum)
    assert(info.sumB === px.map(p => p & 0xff).map(_.toLong).sum)
    assert(info.peak === px.flatMap(p => Seq((p >>> 16) & 0xff, (p >>> 8) & 0xff, p & 0xff)).max)
    assert(!info.hasAlpha)
  }
}
