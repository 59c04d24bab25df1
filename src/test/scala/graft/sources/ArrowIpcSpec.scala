package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArrowIpc._

/** Arrow IPC file format — own-writer/own-reader round trips across
  * the knob space, and BOTH directions cross-checked against the real
  * Arrow Java library on the Spark classpath (independent
  * implementation — the JPEG/ImageIO pattern): our writer must be
  * readable by `ArrowFileReader`, and `ArrowFileWriter` output must
  * decode identically through our reader. Plus truncation/corruption
  * fuzz and out-of-scope rejection.
  */
class ArrowIpcSpec extends AnyFunSuite {

  private val schema3 = Seq(
    Col("a", I64, nullable = true),
    Col("x", F64, nullable = true),
    Col("s", Str, nullable = true))

  /** The q182 fixture synthesis (kept in lockstep with SparkEntry). */
  private def fixture(id: Long): Seq[Seq[IndexedSeq[Option[Any]]]] = {
    val nb = (1 + id % 3).toInt
    (0 until nb).map { b =>
      val n = (3 + (id + b) % 5).toInt
      val aCol = (0 until n).map { i =>
        if ((i + b + id) % 5 == 0) None else Some((id * 7 + b * 31 + i * 3): Any)
      }
      val xCol = (0 until n).map { i =>
        if ((i * 2 + b + id) % 7 == 0) None
        else Some((((id + b * 2 + i * 5) % 97).toDouble): Any)
      }
      val sCol = (0 until n).map { i =>
        if ((i + 2 * b + id) % 4 == 0) None
        else Some(("abc".charAt(((i + id) % 3).toInt).toString * ((i + b + id) % 6).toInt): Any)
      }
      Seq(aCol, xCol, sCol)
    }
  }

  test("own writer -> own reader round trip across the knob space") {
    (0L until 40L).foreach { id =>
      val batches = fixture(id)
      val got = decode(encode(schema3, batches))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(got.schema === schema3, s"id=$id schema")
      assert(got.batches.size === batches.size)
      got.batches.zip(batches).zipWithIndex.foreach { case ((g, w), bi) =>
        assert(g.nRows === w.head.size, s"id=$id batch $bi rows")
        assert(g.cols === w, s"id=$id batch $bi values")
      }
    }
  }

  test("empty strings, all-null and no-null columns survive") {
    val batches = Seq(Seq(
      IndexedSeq(Some(1L: Any), Some(2L: Any), Some(3L: Any)), // no nulls: empty validity
      IndexedSeq(None, None, None), // all null
      IndexedSeq(Some("": Any), None, Some("xyz": Any))))
    val got = decode(encode(schema3, batches)).get
    assert(got.batches.head.cols === batches.head)
  }

  test("own writer -> Arrow Java ArrowFileReader (cross-implementation)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowFileReader
    import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
    val id = 11L
    val batches = fixture(id)
    val bytes = encode(schema3, batches)
    val alloc = new RootAllocator()
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val names = root.getSchema.getFields
      assert(names.size() === 3)
      assert(names.get(0).getName === "a" && names.get(1).getName === "x" &&
        names.get(2).getName === "s")
      var bi = 0
      while (reader.loadNextBatch()) {
        val want = batches(bi)
        assert(root.getRowCount === want.head.size, s"batch $bi rows")
        val av = root.getVector(0).asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val xv = root.getVector(1).asInstanceOf[org.apache.arrow.vector.Float8Vector]
        val sv = root.getVector(2).asInstanceOf[org.apache.arrow.vector.VarCharVector]
        (0 until root.getRowCount).foreach { i =>
          assert((if (av.isNull(i)) None else Some(av.get(i))) ===
            want(0)(i).map(_.asInstanceOf[Long]), s"batch $bi a[$i]")
          assert((if (xv.isNull(i)) None else Some(xv.get(i))) ===
            want(1)(i).map(_.asInstanceOf[Double]), s"batch $bi x[$i]")
          assert((if (sv.isNull(i)) None else Some(new String(sv.get(i), "UTF-8"))) ===
            want(2)(i).map(_.asInstanceOf[String]), s"batch $bi s[$i]")
        }
        bi += 1
      }
      assert(bi === batches.size, "Arrow Java saw every batch")
    } finally { reader.close(); alloc.close() }
  }

  test("Arrow Java ArrowFileWriter -> own reader (cross-implementation)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import java.io.ByteArrayOutputStream
    import java.nio.channels.Channels
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("a", FieldType.nullable(new ArrowType.Int(64, true)), Nil.asJava),
      new Field("x", FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), Nil.asJava),
      new Field("s", FieldType.nullable(new ArrowType.Utf8()), Nil.asJava)).asJava
    val root = VectorSchemaRoot.create(new Schema(fields), alloc)
    val baos = new ByteArrayOutputStream()
    val writer = new ArrowFileWriter(root, null, Channels.newChannel(baos))
    try {
      writer.start()
      (0 until 2).foreach { b =>
        val n = 4 + b
        root.allocateNew()
        val av = root.getVector(0).asInstanceOf[BigIntVector]
        val xv = root.getVector(1).asInstanceOf[Float8Vector]
        val sv = root.getVector(2).asInstanceOf[VarCharVector]
        (0 until n).foreach { i =>
          if ((i + b) % 3 == 0) av.setNull(i) else av.setSafe(i, i * 5L + b)
          if (i % 4 == 1) xv.setNull(i) else xv.setSafe(i, i * 0.5 + b)
          if ((i + b) % 5 == 2) sv.setNull(i)
          else sv.setSafe(i, s"v$i-$b".getBytes("UTF-8"))
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); root.close(); alloc.close() }
    val got = decode(baos.toByteArray).getOrElse(fail("own reader rejected Arrow Java file"))
    assert(got.schema === schema3)
    assert(got.batches.size === 2)
    got.batches.zipWithIndex.foreach { case (batch, b) =>
      val n = 4 + b
      assert(batch.nRows === n)
      (0 until n).foreach { i =>
        assert(batch.cols(0)(i) ===
          (if ((i + b) % 3 == 0) None else Some(i * 5L + b)), s"a[$b,$i]")
        assert(batch.cols(1)(i) ===
          (if (i % 4 == 1) None else Some(i * 0.5 + b)), s"x[$b,$i]")
        assert(batch.cols(2)(i) ===
          (if ((i + b) % 5 == 2) None else Some(s"v$i-$b")), s"s[$b,$i]")
      }
    }
  }

  test("truncation at any prefix and bit corruption decode as None, never throw") {
    val bytes = encode(schema3, fixture(5L))
    // every prefix
    (0 until bytes.length).foreach { n =>
      assert(decode(bytes.take(n)).isEmpty, s"prefix $n")
    }
    // flip one byte in each 16-byte stride: structural fields get hit
    (0 until bytes.length by 16).foreach { p =>
      val c = bytes.clone()
      c(p) = (c(p) ^ 0xff).toByte
      decode(c) // must not throw; validity of result is corruption-dependent
    }
    assert(decode(Array.emptyByteArray).isEmpty)
    assert(decode("ARROW1  but not really an arrow file".getBytes).isEmpty)
  }

  test("out-of-scope files are rejected: a Bool column decodes as None") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BitVector, VectorSchemaRoot}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import java.io.ByteArrayOutputStream
    import java.nio.channels.Channels
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    val fields = List(
      new Field("b", FieldType.nullable(new ArrowType.Bool()), Nil.asJava)).asJava
    val root = VectorSchemaRoot.create(new Schema(fields), alloc)
    val baos = new ByteArrayOutputStream()
    val writer = new ArrowFileWriter(root, null, Channels.newChannel(baos))
    try {
      writer.start()
      root.allocateNew()
      root.getVector(0).asInstanceOf[BitVector].setSafe(0, 1)
      root.setRowCount(1)
      writer.writeBatch()
      writer.end()
    } finally { writer.close(); root.close(); alloc.close() }
    assert(decode(baos.toByteArray).isEmpty)
  }
}
