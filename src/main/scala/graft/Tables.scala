package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic TPC-H-ish corpus (see TESTDATA.md).
  *
  * Columns are pruned and predicates pushed at the parquet scan by
  * Catalyst as long as callers stay declarative — these helpers do
  * nothing but point at the files, so every downstream
  * `.select`/`.filter` reaches the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark handles
    * differently across 4.x point releases: some reject it from the
    * vectorized reader unless `nanosAsLong` maps it to Long, newer
    * ones read it natively as TIMESTAMP_NTZ truncated to micros.
    * Branch on the schema Spark actually produced and normalize both
    * to a session-TZ (UTC) TimestampType at microsecond precision —
    * identical values either way (integer DIV, never a double
    * division, which would round ns-epoch values to multiples of
    * 256ns; the NTZ cast is wall-clock-preserving under the UTC
    * session TZ every entry point pins).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
