package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Phonetic.soundex against the published census vectors, the rules
  * that make implementations diverge, and its use as a FuzzyMatch
  * blocking function.
  */
class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  private def sx(names: String*): Seq[String] =
    names.toDF("w").select(Phonetic.soundex(col("w"))).as[String].collect().toSeq

  test("published reference vectors") {
    assert(sx("Robert") == Seq("R163"))
    assert(sx("Rupert") == Seq("R163"))
    assert(sx("Smith") == Seq("S530"))
    assert(sx("Smyth") == Seq("S530"))
    assert(sx("Tymczak") == Seq("T522"))
    assert(sx("Pfister") == Seq("P236"))
    assert(sx("Honeyman") == Seq("H555"))
    assert(sx("Jackson") == Seq("J250"))
  }

  test("the divergence-prone rules") {
    // H/W do NOT separate same-coded consonants (Ashcraft: S,C both
    // code 2 across the H — one digit, not two)
    assert(sx("Ashcraft") == Seq("A261"))
    assert(sx("Ashcroft") == Seq("A261"))
    // the first letter's own code collapses with a same-coded follower
    assert(sx("Ssmith") == Seq("S530"))
    assert(sx("Pfizer") == Seq("P260"))
    // vowel-initial names keep all their consonant digits
    assert(sx("Aab") == Seq("A100"))
    // vowels DO separate equal codes (both Bs survive)
    assert(sx("Bob") == Seq("B100"))
    // W/H as first letter codes nothing but stays the letter
    assert(sx("White") == Seq("W300"))
    // short names zero-pad; case and non-letters are ignored
    assert(sx("B") == Seq("B000"))
    assert(sx("o'Brien") == Seq("O165"))
    assert(sx("SMITH") == sx("smith"))
  }

  test("phonetic blocking plugs into FuzzyMatch and catches what prefix blocks miss") {
    val left = Seq((1L, "Smith"), (2L, "Robert")).toDF("id", "name")
    val right = Seq((10L, "Smyth"), (20L, "Rupert")).toDF("id", "name")
    // prefix blocking misses Smith/Smyth at block "sm"? no — catches; but Robert/Rupert
    // diverge at char 2, so the 2-char prefix block misses them
    val prefixPairs = graft.dedup.FuzzyMatch.fuzzyPairs(left, right, maxDist = 3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(!prefixPairs.contains((2L, 20L)), "precondition: prefix block misses Robert/Rupert")
    val phoneticPairs = graft.dedup.FuzzyMatch.fuzzyPairs(left, right, maxDist = 3,
        blockFn = (c, _) => Phonetic.soundex(c))
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(phoneticPairs.contains((2L, 20L)) && phoneticPairs.contains((1L, 10L)))
  }
}
