package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Raw Snappy block codec — round trips, overlap-copy semantics,
  * malformed rejection, and bidirectional cross-checks against
  * snappy-java (the reference implementation on the Spark classpath).
  */
class SnappySpec extends AnyFunSuite {

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "a".getBytes("UTF-8"),
    "abcd".getBytes("UTF-8"),
    ("the quick brown fox jumps over the lazy dog. " * 50).getBytes("UTF-8"),
    Array.fill(100000)('x'.toByte), // long run → overlapped copies
    Array.tabulate(5000)(i => (i * 31 % 251).toByte), // pseudo-random, little reuse
    ("abcabcabc" + "z" * 70 + "abcabcabc").getBytes("UTF-8"))

  test("round trip through our encoder and decoder") {
    samples.foreach { s =>
      assert(Snappy.uncompress(Snappy.compress(s)).sameElements(s))
    }
  }

  test("repetitive input genuinely compresses (copies are emitted)") {
    val runs = ("tokenize the corpus " * 200).getBytes("UTF-8")
    assert(Snappy.compress(runs).length < runs.length / 5)
  }

  test("our streams decompress through snappy-java") {
    samples.foreach { s =>
      assert(org.xerial.snappy.Snappy.uncompress(Snappy.compress(s)).sameElements(s))
    }
  }

  test("snappy-java streams decompress through our decoder") {
    samples.foreach { s =>
      assert(Snappy.uncompress(org.xerial.snappy.Snappy.compress(s)).sameElements(s))
    }
  }

  test("overlapped copy replicates runs byte-by-byte") {
    // hand-built stream: 4-byte literal "ab", then copy offset 2 len 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(10) // uncompressed length 10
    out.write((2 - 1) << 2); out.write('a'); out.write('b') // literal "ab"
    out.write(2 | ((8 - 1) << 2)); out.write(2); out.write(0) // copy2 off=2 len=8
    assert(new String(Snappy.uncompress(out.toByteArray), "UTF-8") === "ababababab")
  }

  test("malformed streams throw (truncation, bad offset, short output)") {
    val good = Snappy.compress("hello snappy world hello snappy world".getBytes("UTF-8"))
    assertThrows[IllegalStateException](Snappy.uncompress(good.dropRight(3)))
    assertThrows[IllegalStateException](Snappy.uncompress(Array[Byte]()))
    // copy before any output: tag copy1 len4 offset 1 with empty history
    assertThrows[IllegalStateException](Snappy.uncompress(Array[Byte](4, 1, 0)))
    // declared length larger than produced
    assertThrows[IllegalStateException](Snappy.uncompress(Array[Byte](50, 0, 'x')))
  }
}
