package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Avro OCF codec — round trips for all three codecs and the full
  * type subset, malformed rejection, and bidirectional cross-checks
  * against the real Apache Avro library (on the Spark classpath).
  */
class AvroSpec extends AnyFunSuite {
  import Avro._

  private val schema = SRecord("Doc", Vector(
    "id" -> SLong,
    "name" -> SString,
    "score" -> SDouble,
    "flag" -> SBoolean))

  private val records: Seq[Seq[Any]] = (0 until 23).map { i =>
    Seq(i.toLong * 7, s"row_$i", i * 0.25, i % 2 == 0)
  }

  test("round trip: all three codecs, multi-block framing") {
    Seq("null", "deflate", "snappy").foreach { codec =>
      val bytes = encode(schema, records, codec, blockSize = 5)
      val info = decode(bytes)
      assert(info.valid, codec)
      assert(info.codec === codec)
      assert(info.schemaName === "Doc")
      assert(info.nRecords === 23L)
      assert(info.nBlocks === 5L) // ceil(23/5)
      assert(Avro.records(bytes) === records)
      assert(fieldNames(bytes) === Seq("id", "name", "score", "flag"))
    }
  }

  test("full type subset round-trips: int/float/bytes/enum/fixed/array/map/union") {
    val wide = SRecord("Wide", Vector(
      "i" -> SInt, "f" -> SFloat, "b" -> SBytes,
      "e" -> SEnum("Color", Vector("RED", "GREEN", "BLUE")),
      "x" -> SFixed("Pair", 2),
      "xs" -> SArray(SLong),
      "m" -> SMap(SInt),
      "u" -> SUnion(Vector(SNull, SString))))
    val rows: Seq[Seq[Any]] = Seq(
      Seq(42, 1.5f, Array[Byte](1, 2, 3), "GREEN", Array[Byte](9, 8),
        Seq(1L, 2L, 3L), Map("a" -> 1, "b" -> 2), "present"),
      Seq(-7, -0.25f, Array.emptyByteArray, "RED", Array[Byte](0, 0),
        Seq.empty[Long], Map.empty[String, Int], null))
    val got = Avro.records(encode(wide, rows, "deflate"))
    assert(got.size === 2)
    got.zip(rows).foreach { case (g, r) =>
      g.zip(r).foreach {
        case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
        case (a, b) => assert(a === b)
      }
    }
  }

  test("our files decode through the Apache Avro library, all codecs") {
    Seq("null", "deflate", "snappy").foreach { codec =>
      val bytes = encode(schema, records, codec, blockSize = 7)
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      assert(reader.getMetaString("avro.codec") === codec)
      val got = reader.iterator().asScala.map { r =>
        Seq(r.get("id"), r.get("name").toString, r.get("score"), r.get("flag"))
      }.toList
      reader.close()
      assert(got === records.toList, codec)
    }
  }

  test("Apache-Avro-written files decode through our reader, all codecs") {
    Seq("null", "deflate", "snappy").foreach { codec =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(schemaJson(schema))
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
      writer.setCodec(codec match {
        case "null" => org.apache.avro.file.CodecFactory.nullCodec()
        case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
        case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
      })
      val bos = new java.io.ByteArrayOutputStream()
      writer.create(avroSchema, bos)
      records.foreach { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        rec.put("id", r(0)); rec.put("name", r(1)); rec.put("score", r(2)); rec.put("flag", r(3))
        writer.append(rec)
      }
      writer.close()
      val bytes = bos.toByteArray
      val info = decode(bytes)
      assert(info.valid, codec)
      assert(info.nRecords === 23L)
      assert(Avro.records(bytes) === records, codec)
    }
  }

  test("malformed files yield valid=false / Nil, never exceptions") {
    val good = encode(schema, records, "snappy", blockSize = 5)
    assert(!decode(good.take(3)).valid) // truncated magic
    assert(!decode("NotAvroAtAll".getBytes("UTF-8") ++ good.drop(12)).valid)
    assert(!decode(good.dropRight(10)).valid) // truncated final block
    // flip a byte inside a snappy payload: CRC catches it
    val corrupt = good.clone()
    corrupt(good.length - 30) = (corrupt(good.length - 30) ^ 0x41).toByte
    assert(!decode(corrupt).valid)
    assert(Avro.records(corrupt) === Nil)
    // sync marker corruption on a null-codec file
    val plain = encode(schema, records, "null", blockSize = 100)
    val badSync = plain.clone()
    badSync(plain.length - 1) = (badSync(plain.length - 1) ^ 1).toByte
    assert(!decode(badSync).valid)
  }

  test("schema JSON parser handles escapes, nesting and named references") {
    val s = parseSchema(
      """{"type":"record","name":"Outer","fields":[
        |  {"name":"tag","type":{"type":"enum","name":"T","symbols":["A","B"]}},
        |  {"name":"again","type":"T"},
        |  {"name":"label","type":"string"}]}""".stripMargin)
    s match {
      case SRecord("Outer", fs) =>
        assert(fs.map(_._1) === Vector("tag", "again", "label"))
        assert(fs(0)._2 === fs(1)._2) // reference resolved to the same enum
      case other => fail(s"unexpected $other")
    }
  }
}
