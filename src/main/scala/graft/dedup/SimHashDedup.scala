package graft.dedup

import graft.functions.SimHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection. One codegen'd pass computes a
  * 64-bit fingerprint per doc (custom Catalyst expression — see
  * graft.functions.SimHash64); candidate pairs come from a banding
  * trick on the fingerprint (docs within Hamming distance d share at
  * least one of (d+1) disjoint bit-bands by pigeonhole), so the
  * corpus-wide shuffle again carries only (band_key, id, simhash).
  */
object SimHashDedup {

  /** (id, simhash) fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    SimHash.register(docs.sparkSession) // idempotent
    docs.select(col(idCol), SimHash.simhash64(col(textCol)).as("simhash"))
  }

  /** Pairs within maxHamming, found via 4×16-bit band buckets
    * (guarantees recall for maxHamming <= 3; higher distances are
    * still found when any band happens to match).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
    val banded = fp.select(
      col(idCol), col("simhash"),
      posexplode(array((0 until 4).map { j =>
        shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("band_idx", "band_key")))
    val a = banded.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SimHash.hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
