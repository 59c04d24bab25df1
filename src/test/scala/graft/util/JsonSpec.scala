package graft.util

import org.scalatest.funsuite.AnyFunSuite

class JsonSpec extends AnyFunSuite {

  test("write/parse round-trips objects, arrays, escapes and number types") {
    val v = scala.collection.immutable.ListMap[String, Any](
      "s" -> "a\"b\\c\nd\tef",
      "l" -> 9223372036854775807L,
      "neg" -> -42L,
      "d" -> 0.1,
      "dInt" -> 3.0,
      "b" -> true,
      "z" -> null,
      "arr" -> Vector(1L, "x", false))
    val s = Json.write(v)
    val back = Json.parse(s).asInstanceOf[Map[String, Any]]
    assert(back("s") === "a\"b\\c\nd\tef")
    assert(back("l") === 9223372036854775807L, "Long.MaxValue must survive exactly")
    assert(back("l").isInstanceOf[Long])
    assert(back("neg") === -42L)
    assert(back("d") === 0.1)
    assert(back("dInt") === 3.0, "3.0 stays a Double (has a point)")
    assert(back("dInt").isInstanceOf[Double])
    assert(back("b") === true && back("z") === null)
    assert(back("arr") === Vector(1L, "x", false))
  }

  test("parse handles unicode escapes, nesting, whitespace; rejects trailing junk") {
    val m = Json.parse("""  {"a": [ {"b" : "Aé"} ], "n": -1.5e2 } """)
      .asInstanceOf[Map[String, Any]]
    assert(m("a").asInstanceOf[Vector[Any]].head.asInstanceOf[Map[String, Any]]("b") === "Aé")
    assert(m("n") === -150.0)
    intercept[IllegalArgumentException](Json.parse("""{"a":1} x"""))
    intercept[Exception](Json.parse("""{"a":"""))
  }

  test("writer rejects non-finite doubles and unknown types") {
    intercept[IllegalArgumentException](Json.write(Double.NaN))
    intercept[IllegalArgumentException](Json.write(new Object))
  }
}
