package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** American Soundex phonetic encoding as pure column expressions —
  * the phonetic BLOCKING function for entity resolution (FuzzyMatch
  * takes `blockFn` precisely so callers can union prefix, length,
  * and phonetic blocks; sorted-neighborhood keys work too): records
  * that SOUND alike land in the same block even when their spellings
  * diverge beyond an edit-distance prefix ("Robert"/"Rupert" both
  * R163, "Smith"/"Smyth" both S530).
  *
  * Standard algorithm, expressed as a translate + regexp chain every
  * SQL engine mirrors verbatim (no UDF, stays in codegen):
  *  1. uppercase; strip non-letters;
  *  2. drop H and W after the first letter (they do NOT separate
  *     same-coded consonants — the classic tricky rule, which
  *     removing them FIRST reduces to plain adjacent collapse);
  *  3. map consonants to digits (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5
  *     R→6), vowels+Y to 0;
  *  4. collapse adjacent equal digits (the first letter's own code
  *     participates — S530 for "Ssmith", not S253);
  *  5. drop the zeros (vowels separate, so collapse happened first);
  *  6. first LETTER + first three remaining digits, zero-padded.
  */
object Phonetic {

  private val From = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val To   = "01230120022455012623010202" // H/W pre-stripped; Y→0

  def soundex(name: Column): Column = {
    val letters = regexp_replace(upper(name), "[^A-Z]", "")
    // H/W dropped after position 1 so flanked same-code consonants
    // become adjacent before the collapse
    val hw = concat(substring(letters, 1, 1),
      regexp_replace(substring(letters, 2, 1000000), "[HW]", ""))
    val digits = translate(hw, From, To)
    // adjacent-run collapse as six literal replaces: backreferences
    // are Java-regex-only (RE2 engines reject them), and the PII
    // redaction rule applies — keep every pattern in the
    // Java∩RE2 portable subset so the oracle mirror is verbatim
    val collapsed = (1 to 6).foldLeft(digits)((c, d) =>
      regexp_replace(c, s"$d$d+", d.toString))
    val noZeros = regexp_replace(collapsed, "0", "")
    // the first letter replaces its own code: drop the leading digit
    // of noZeros ONLY if the first letter produced a nonzero code
    // (vowel-initial names keep all their digits)
    val firstCode = substring(digits, 1, 1)
    val tail = when(firstCode === "0", noZeros)
      .otherwise(substring(noZeros, 2, 1000000))
    when(length(letters) === 0, lit(null))
      .otherwise(concat(substring(letters, 1, 1), rpad(substring(tail, 1, 3), 3, "0")))
  }
}
