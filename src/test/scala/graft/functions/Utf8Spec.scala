package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** UTF-8 validator/repairer — WHATWG maximal-subpart replacement
  * semantics pinned case by case, agreement with the JDK on valid
  * input, and the mojibake signature counter.
  */
class Utf8Spec extends AnyFunSuite {

  private def dec(bytes: Int*): (String, Int) =
    Utf8.decodeReplacing(bytes.map(_.toByte).toArray)

  test("valid ASCII, BMP and astral sequences decode exactly") {
    val s = "hello é € 한 😀 world"
    val (out, bad) = Utf8.decodeReplacing(s.getBytes(UTF_8))
    assert(out === s)
    assert(bad === 0)
    assert(out.codePointCount(0, out.length) === s.codePointCount(0, s.length))
  }

  test("valid inputs agree with the JDK decoder byte-for-byte") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val cps = Seq.fill(30)(rnd.nextInt(0x10ffff + 1))
        .filter(cp => cp < 0xd800 || cp > 0xdfff)
      val s = new String(cps.toArray, 0, cps.length)
      val (out, bad) = Utf8.decodeReplacing(s.getBytes(UTF_8))
      assert(bad === 0)
      assert(out === new String(s.getBytes(UTF_8), UTF_8))
    }
  }

  test("lone continuation bytes: one replacement each") {
    assert(dec(0x80) === (("�", 1)))
    assert(dec('a', 0x80, 0xbf, 'b') === (("a��b", 2)))
  }

  test("overlong forms are rejected per byte (C0/C1 are never valid leads)") {
    // C0 80 — the classic overlong NUL: two maximal subparts
    assert(dec(0xc0, 0x80) === (("��", 2)))
    assert(dec(0xc1, 0xbf) === (("��", 2)))
    // E0 80 80 — overlong via E0 second-byte range: E0 alone, then 2 conts
    assert(dec(0xe0, 0x80, 0x80) === (("���", 3)))
  }

  test("surrogate encodings are invalid (ED A0..BF excluded)") {
    assert(dec(0xed, 0xa0, 0x80) === (("���", 3)))
    // ED 9F BF = U+D7FF, the last codepoint before the gap — valid
    assert(dec(0xed, 0x9f, 0xbf) === (("퟿", 0)))
  }

  test("beyond U+10FFFF is invalid (F4 90+, F5..FF leads)") {
    assert(dec(0xf4, 0x90, 0x80, 0x80)._2 === 4) // F4 alone + 3 lone conts
    assert(dec(0xf4, 0x8f, 0xbf, 0xbf) === ((new String(Array(0x10ffff), 0, 1), 0)))
    assert(dec(0xf5, 0x80)._2 === 2)
    assert(dec(0xff)._2 === 1)
  }

  test("truncation consumes the valid prefix as ONE maximal subpart") {
    assert(dec('a', 0xc3) === (("a�", 1)))
    assert(dec(0xe1, 0x80) === (("�", 1)))
    assert(dec(0xf0, 0x90, 0x80) === (("�", 1)))
    // invalid third byte: lead+cont consumed together, then 'A' survives
    assert(dec(0xe1, 0x80, 'A') === (("�A", 1)))
  }

  test("mojibake pairs: double-encoded text flags, clean text does not") {
    // "é" double-encoded: Ã (U+00C3) followed by © (U+00A9)
    val doubled = new String("é".getBytes(UTF_8).map(b => (b & 0xff).toChar))
    assert(doubled === "Ã©")
    assert(Utf8.mojibakePairs(s"caf$doubled au lait") === 1)
    assert(Utf8.mojibakePairs("café au lait") === 0)
    assert(Utf8.mojibakePairs("plain ascii") === 0)
    // Â-led double encodings count too (U+00A0-range originals)
    val nbsp = new String(" ".getBytes(UTF_8).map(b => (b & 0xff).toChar))
    assert(Utf8.mojibakePairs(s"x${nbsp}y") === 1)
  }

  test("null payload yields an empty clean result") {
    assert(Utf8.decodeReplacing(null) === (("", 0)))
  }
}
