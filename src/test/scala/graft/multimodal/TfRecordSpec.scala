package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing + tf.Example wire walk — round trips, the public
  * CRC32C vector, hand-derived wire bytes, packed ≡ unpacked
  * acceptance, unknown-field skipping, and a malformed set.
  */
class TfRecordSpec extends AnyFunSuite {
  import TfRecord._

  private val examples: Seq[Example] = Seq(
    Vector(
      "id" -> Int64F(Vector(42L)),
      "text" -> BytesF(Vector("hello tfrecord".getBytes("UTF-8"))),
      "emb" -> FloatF(Vector(0.5f, -1.25f, 3.0f))),
    Vector(
      "id" -> Int64F(Vector(-7L, 9L)), // negative int64 = 10-byte varint
      "text" -> BytesF(Vector(Array.emptyByteArray, "two".getBytes("UTF-8"))),
      "emb" -> FloatF(Vector.empty)))

  test("round trip: framing, features, values") {
    val bytes = encodeFile(examples)
    val info = decode(bytes)
    assert(info.valid)
    assert(info.nRecords === 2L)
    assert(info.nFeatures === 6L)
    val got = TfRecord.examples(bytes)
    assert(got.size === 2)
    got.zip(examples).foreach { case (g, e) =>
      assert(g.map(_._1) === e.map(_._1))
      g.zip(e).foreach {
        case ((_, BytesF(a)), (_, BytesF(b))) =>
          assert(a.size === b.size)
          a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
        case ((_, a), (_, b)) => assert(a === b)
      }
    }
  }

  test("CRC32C matches the public check vector; masking is the spec formula") {
    // The Castagnoli polynomial's canonical test: crc32c("123456789") = 0xe3069283
    val c = new java.util.zip.CRC32C()
    c.update("123456789".getBytes("UTF-8"))
    assert(c.getValue === 0xe3069283L)
    val crc = c.getValue.toInt
    assert(maskedCrc("123456789".getBytes("UTF-8"), 0, 9) ===
      ((crc >>> 15) | (crc << 17)) + 0xa282ead8)
  }

  test("hand-derived wire bytes decode exactly") {
    // Example{features{feature{key:"a" value{int64_list{value:[5]}}}}}
    // built from the wire spec by hand, innermost out:
    //   Int64List: packed field 1 → 0a 01 05
    //   Feature: int64_list field 3 → 1a 03 0a 01 05
    //   map entry: key field 1 "a" → 0a 01 61; value field 2 → 12 05 <feature>
    //   Features: entry field 1 → 0a 0a <entry>
    //   Example: features field 1 → 0a 0c <features>
    val feature = Array[Byte](0x1a, 3, 0x0a, 1, 5)
    val entry = Array[Byte](0x0a, 1, 0x61, 0x12, 5) ++ feature
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0a, features.length.toByte) ++ features
    val out = new java.io.ByteArrayOutputStream()
    val len = new Array[Byte](8); len(0) = example.length.toByte
    out.write(len)
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    u32(maskedCrc(len, 0, 8))
    out.write(example)
    u32(maskedCrc(example, 0, example.length))
    val got = TfRecord.examples(out.toByteArray)
    assert(got === Seq(Vector("a" -> Int64F(Vector(5L)))))
  }

  test("unpacked repeated int64/float decode identically to packed") {
    // unpacked Int64List{value: 5, value: 300}: field 1 varint twice
    //   08 05 08 ac 02
    val unpackedInts = Array[Byte](0x08, 5, 0x08, 0xac.toByte, 0x02)
    // unpacked FloatList{value: 1.0f}: field 1 fixed32 → 0d 00 00 80 3f
    val unpackedFloats = Array[Byte](0x0d, 0, 0, 0x80.toByte, 0x3f)
    def feature(kindField: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](((kindField << 3) | 2).toByte, body.length.toByte) ++ body
    def exampleWith(f: Array[Byte]): Array[Byte] = {
      val entry = Array[Byte](0x0a, 1, 0x7a, 0x12, f.length.toByte) ++ f // key "z"
      val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
      Array[Byte](0x0a, features.length.toByte) ++ features
    }
    def frame(payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = new Array[Byte](8); len(0) = payload.length.toByte
      out.write(len)
      def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      u32(maskedCrc(len, 0, 8)); out.write(payload); u32(maskedCrc(payload, 0, payload.length))
      out.toByteArray
    }
    assert(TfRecord.examples(frame(exampleWith(feature(3, unpackedInts)))) ===
      Seq(Vector("z" -> Int64F(Vector(5L, 300L)))))
    assert(TfRecord.examples(frame(exampleWith(feature(2, unpackedFloats)))) ===
      Seq(Vector("z" -> FloatF(Vector(1.0f)))))
  }

  test("unknown fields are skipped by wire type") {
    // append an unknown field 9 varint to an otherwise-valid Example
    val base = encodeExample(Vector("a" -> Int64F(Vector(1L))))
    val withUnknown = base ++ Array[Byte](((9 << 3) | 0).toByte, 0x2a)
    val out = new java.io.ByteArrayOutputStream()
    val len = new Array[Byte](8); len(0) = withUnknown.length.toByte
    out.write(len)
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    u32(maskedCrc(len, 0, 8)); out.write(withUnknown); u32(maskedCrc(withUnknown, 0, withUnknown.length))
    assert(TfRecord.examples(out.toByteArray) === Seq(Vector("a" -> Int64F(Vector(1L)))))
  }

  test("malformed files yield valid=false / Nil") {
    val good = encodeFile(examples)
    assert(!decode(good.dropRight(2)).valid) // truncated data CRC
    assert(!decode(good.take(10)).valid) // truncated header
    val flippedData = good.clone()
    flippedData(14) = (flippedData(14) ^ 1).toByte // inside first payload
    assert(!decode(flippedData).valid)
    assert(TfRecord.examples(flippedData) === Nil)
    val flippedLen = good.clone()
    flippedLen(0) = (flippedLen(0) ^ 1).toByte // length byte: length CRC catches
    assert(!decode(flippedLen).valid)
    assert(decode(Array.emptyByteArray).valid) // zero records is a valid file
  }
}
