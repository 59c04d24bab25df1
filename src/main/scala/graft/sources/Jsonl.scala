package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL ingestion with QUARANTINE-NOT-DROP — the record format
  * dataset releases actually ship (one JSON object per line). At
  * 100 TB a malformed line must neither kill the job (FAILFAST) nor
  * vanish silently (DROPMALFORMED): it lands in the output flagged,
  * with its raw bytes kept for forensics, and the good rows parse
  * through Catalyst's native JsonToStructs (codegen'd schema
  * projection, no UDF). This is the D8 quarantine discipline applied
  * to the batch record-format tier next to Avro/TFRecord (q142).
  */
object Jsonl {

  /** Parse `lineCol` against `schema`: output carries every schema
    * field plus `raw` (the original line) and `parse_ok`. A malformed
    * line yields one row with parse_ok = false and null fields — rows
    * in, rows out, nothing dropped. PERMISSIVE corrupt-record
    * detection rides a reserved `_bad` column internally.
    */
  def parse(lines: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_bad"),
      "jsonl: '_bad' is reserved for corrupt-record detection")
    val withBad = schema.add("_bad", StringType, nullable = true)
    val p = lines.withColumn("_p", from_json(col(lineCol), withBad,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")))
    p.select(
      (col(lineCol).as("raw") +:
        (col("_p._bad").isNull && col("_p").isNotNull).as("parse_ok") +:
        schema.fieldNames.toSeq.map(f => col(s"_p.$f").as(f))): _*)
  }
}
