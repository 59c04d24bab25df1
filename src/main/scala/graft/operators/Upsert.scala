package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed-snapshot maintenance: the MERGE INTO / CDC-apply shape
  * (Spark OSS has no MERGE statement without a table format; the
  * relational core is this full-outer join) and the SCD2 history
  * build.
  *
  * Scale shape: one shuffle of each side on the key (with the base
  * snapshot bucketed on the key — B15 — the base side's exchange
  * disappears; the delta side is usually ≪ base). Every output row
  * carries its decision (`op`), so the merge doubles as its own audit
  * — the good-file/bad-file pattern applied to CDC.
  */
object Upsert {

  /** Apply a change batch to a keyed snapshot (last-writer-wins per
    * key within the batch is the CALLER's contract — pre-dedup the
    * batch if it can carry multiple versions of one key). Rows in
    * `updates` with `deleteCol` true remove the key; other update
    * rows insert or replace. Output: the merged snapshot's value
    * columns + `op` in insert/update/delete/carry; deleted keys are
    * RETAINED with op='delete' so the audit sees them — consumers
    * take `.filter($"op" =!= "delete")` for the new snapshot.
    */
  def merge(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
            deleteCol: String = "_delete"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val valCols = base.columns.filterNot(keyCols.contains).toSeq
    require(updates.columns.toSet == (keyCols ++ valCols :+ deleteCol).toSet,
      s"updates must carry the base schema + $deleteCol")
    // explicit presence markers: value columns may legitimately hold
    // nulls, so side membership can't be inferred from them
    val b = valCols.foldLeft(base)((df, c) => df.withColumnRenamed(c, s"_b_$c"))
      .withColumn("_b_present", lit(true))
    val u = valCols.foldLeft(updates)((df, c) => df.withColumnRenamed(c, s"_u_$c"))
      .withColumn("_u_present", lit(true))
    val joined = b.join(u, keyCols, "full_outer")
    val op = when(col("_u_present").isNotNull && col(deleteCol), "delete")
      .when(col("_u_present").isNotNull && col("_b_present").isNotNull, "update")
      .when(col("_u_present").isNotNull, "insert")
      .otherwise("carry")
    // side-presence picks the value, NOT coalesce: an update row that
    // carries NULL in a value column must WRITE that null (standard
    // MERGE semantics) rather than silently retain the base value
    joined.select(keyCols.map(col) ++
      valCols.map(c =>
        when(col("_u_present").isNotNull, col(s"_u_$c"))
          .otherwise(col(s"_b_$c")).as(c)) :+
      op.as("op"): _*)
  }

  /** SCD2 history build from a change log: one version row per
    * change, with [valid_from, valid_to) half-open validity derived
    * from the NEXT change of the same key (`lead`), null valid_to +
    * is_current on the latest. Order must be total per key —
    * `orderCols` must be unique within a key. One shuffle on the key;
    * the window is a per-key sweep.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String],
           orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("version_no", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(orderCols.head, "valid_from")
  }
}
