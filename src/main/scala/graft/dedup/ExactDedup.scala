package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content fingerprint.
  *
  * Scale shape: the shuffle carries only (fingerprint, id) — 48 bytes
  * a row — never the document payload. Keepers are resolved with a
  * groupBy min, then the full rows are recovered with a semi-join on
  * the (narrow, broadcastable-after-AQE) keeper set. At 100 TB this
  * is one narrow shuffle + one join keyed on the table's own id.
  */
object ExactDedup {

  /** (fingerprint, keeper_id, copies) — one row per distinct content. */
  def groups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /** The deduplicated table: keeps the min-id row per fingerprint. */
  def dedupe(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = groups(df, idCol, textCol).select(col("keeper_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** Only the rows that would be dropped (for audit sinks). */
  def duplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = groups(df, idCol, textCol).select(col("keeper_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_anti")
  }
}
