package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PyTitleSpec extends SparkSpec {
  import spark.implicits._

  // Ground truth generated with CPython: `s.title()` for each input.
  // Covers the semantics initcap gets wrong (re-capitalization after
  // apostrophes, digits, hyphens) plus the digraph titlecase mapping.
  private val vectors = Seq(
    "menu 42" -> "Menu 42",
    "bob's cafe 2go" -> "Bob'S Cafe 2Go",
    "pnf-food-drinks" -> "Pnf-Food-Drinks",
    "abc3de" -> "Abc3De",
    "HELLO WORLD" -> "Hello World",
    "ǆungla" -> "ǅungla",
    "" -> "",
    "123" -> "123",
    "l'étoile" -> "L'Étoile",
    "great india" -> "Great India",
    "x2y3z" -> "X2Y3Z",
    "  spaced  out " -> "  Spaced  Out ",
    "MiXeD-CaSe_Str" -> "Mixed-Case_Str")

  test("py_title matches CPython str.title() on the vector set (interpreted + codegen)") {
    PyTitleFunctions.register(spark)
    val df = vectors.zipWithIndex.map { case ((in, _), i) => (i, in) }.toDF("i", "s")
    val out = df.select($"i", PyTitleFunctions.pyTitle($"s").as("t"))
      .as[(Int, String)].collect().toMap
    vectors.zipWithIndex.foreach { case ((in, expected), i) =>
      assert(out(i) == expected, s"title(${in.take(20)}): got ${out(i)}, want $expected")
    }
  }

  test("py_title supports whole-stage codegen (no CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[PyTitle]))
  }

  test("one-to-many FULL case mappings match CPython (vectors from 3.11)") {
    PyTitleFunctions.register(spark)
    // chr.title()/.lower() expansions: word-initial ß → "Ss" (but ß
    // after a cased char stays ß — lowercase full mapping of ß is
    // itself), ﬁ/ﬂ/ﬃ/ﬆ ligatures expand, ŉ → ʼN, lowercase İ → i +
    // combining dot (the one one-to-many LOWER mapping), digraph ǳ
    // uses its real titlecase codepoint ǲ.
    val vectors = Seq(
      "straße weg" -> "Straße Weg",
      "ﬁsh and ﬂour" -> "Fish And Flour",
      "ŉe test" -> "ʼNe Test",
      "İstanbul İZMİR" -> "İstanbul İzmi̇r",
      "ǳur ǆeneric" -> "ǲur ǅeneric",
      "ßß ßa aß" -> "Ssß Ssa Aß",
      "ﬃ ﬆop" -> "Ffi Stop")
    val out = vectors.zipWithIndex.map { case ((in, _), i) => (i, in) }
      .toDF("i", "s")
      .select($"i", PyTitleFunctions.pyTitle($"s").as("t"))
      .as[(Int, String)].collect().toMap
    vectors.zipWithIndex.foreach { case ((in, expected), i) =>
      assert(out(i) == expected, s"title($in): got ${out(i)}, want $expected")
    }
  }

  test("restaurantName re-capitalizes after apostrophes and digits like the reference") {
    PyTitleFunctions.register(spark)
    val names = Seq("/menus/bob's_diner_2go.pdf", "/m/o'malley-pub.txt")
      .toDF("source")
      .select(graft.etl.DocMeta.restaurantName($"source").as("n"))
      .as[String].collect().toSeq
    // Python: Path("bob's_diner_2go.pdf").stem.replace("_"," ").title()
    //   == "Bob'S Diner 2Go";  "o'malley-pub" → "O'Malley-Pub"
    assert(names == Seq("Bob'S Diner 2Go", "O'Malley-Pub"))
  }
}
