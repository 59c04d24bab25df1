package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching (entity resolution / fuzzy dedup)
  * with BLOCKING: a raw `levenshtein(a, b) <= d` join is a cartesian
  * product — never viable beyond toy sizes. Candidates are instead
  * restricted to pairs sharing a normalized first-`blockPrefix`-chars
  * block, which turns the join into a hash join on the block key; the
  * exact edit distance then filters within blocks.
  *
  * The standard recall tradeoff of prefix blocking applies: pairs
  * whose difference touches the first `blockPrefix` characters are
  * missed. Production systems union multiple blocking functions
  * (prefix, suffix, phonetic, length band) — each is one more
  * hash-join pass over the same shape; this operator takes the
  * blocking column as a parameter so callers compose exactly that.
  */
object FuzzyMatch {

  /** Default blocking key: lowercase, whitespace collapsed, first k chars. */
  def prefixBlock(c: Column, k: Int): Column =
    substring(regexp_replace(lower(trim(c)), "\\s+", " "), 1, k)

  /** Pairs (left id, right id, distance) with edit distance <= maxDist,
    * candidates limited to same-block pairs. left: (idCol, keyCol);
    * right: (idCol, keyCol) — ids must be distinct namespaces or the
    * caller filters self-pairs.
    */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxDist: Int,
                 idCol: String = "id", keyCol: String = "name",
                 blockPrefix: Int = 2,
                 blockFn: (Column, Int) => Column = prefixBlock): DataFrame = {
    require(maxDist >= 0 && blockPrefix > 0)
    val l = left.select(col(idCol).as("id_l"), col(keyCol).as("_kl"))
      .withColumn("_block", blockFn(col("_kl"), blockPrefix))
    val r = right.select(col(idCol).as("id_r"), col(keyCol).as("_kr"))
      .withColumn("_block", blockFn(col("_kr"), blockPrefix))
    l.join(r, Seq("_block"))
      // cheap length-band prune before the O(len^2) edit distance
      .filter(abs(length(col("_kl")) - length(col("_kr"))) <= maxDist)
      .withColumn("distance", levenshtein(col("_kl"), col("_kr")).cast("long"))
      .filter(col("distance") <= maxDist)
      .select(col("id_l"), col("id_r"), col("distance"))
  }
}
