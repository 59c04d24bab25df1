package graft.functions

import graft.SparkSpec

/** Compressibility — exactness parity with a direct driver-side
  * java.util.zip call (the evidence the q97 rows-only declaration
  * leans on), ordering properties of the signal, edge cases, and
  * partition invariance.
  */
class CompressibilitySpec extends SparkSpec {
  import spark.implicits._

  private def direct(text: String): (Long, Long) = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(6)
    val n = Compressibility.deflatedLen(d, bytes)
    d.end()
    (bytes.length.toLong, n)
  }

  private val docs = Seq(
    (1L, "word " * 400),                       // pure template
    (2L, "the quick brown fox jumps over the lazy dog while morning light settles across the valley " +
      "and a distant train carries travelers toward the coast where fishermen trade stories about " +
      "weather patterns shifting earlier each season as children gather shells along the shore and " +
      "merchants arrange fruit in careful rows before the market opens its gates to the waiting crowd " +
      "that slowly fills the narrow streets with conversation music and the smell of fresh bread"),
    (3L, { val r = new scala.util.Random(42) // seeded: deterministic noise
      (0 until 2000).map(_ => (r.nextInt(94) + 33).toChar).mkString }),
    (4L, ""),                                  // empty
    (5L, null.asInstanceOf[String]),           // null -> empty
    (6L, "naïve café — ünïcødé ✓ " * 30)       // multi-byte UTF-8
  ).toDF("doc_id", "text")

  private def run(d: org.apache.spark.sql.DataFrame) =
    Compressibility.signal(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("distributed results equal a direct java.util.zip call per doc") {
    val got = run(docs)
    val rows = docs.collect().map(r => (r.getLong(0),
      Option(r.getString(1)).getOrElse("")))
    rows.foreach { case (id, text) =>
      val (raw, deflated) = direct(text)
      assert(got(id)._1 === raw, s"doc $id raw")
      assert(got(id)._2 === deflated, s"doc $id deflated")
      val permille = if (raw == 0) 0L else deflated * 1000L / raw
      assert(got(id)._3 === permille, s"doc $id ratio")
    }
  }

  test("signal orders: template < prose < random; empty is zero") {
    val got = run(docs)
    assert(got(1L)._3 < got(2L)._3, "template must compress harder than prose")
    assert(got(2L)._3 < got(3L)._3, "prose must compress harder than random")
    assert(got(3L)._3 > 800L, "seeded-noise text is near-incompressible")
    assert(got(1L)._3 < 100L, "pure template compresses 10x+")
    assert(got(4L) === ((0L, got(4L)._2, 0L)) && got(5L)._1 === 0L)
  }

  test("multi-byte UTF-8 counts bytes, not chars") {
    val got = run(docs)
    val text = "naïve café — ünïcødé ✓ " * 30
    assert(got(6L)._1 === text.getBytes("UTF-8").length.toLong)
    assert(got(6L)._1 > text.length.toLong)
  }

  test("partition invariance and determinism across runs") {
    val a = run(docs)
    val b = run(docs.repartition(7))
    val c = run(docs.repartition(1))
    assert(a === b && a === c)
  }
}
