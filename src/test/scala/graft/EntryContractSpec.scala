package graft

/** Driver-contract invariants: the queries/oracleSql maps must stay
  * consistent (a dangling oracle key or an unanalyzable query would
  * surface as a confusing driver-side failure instead of a red test),
  * and every query must at least pass ANALYSIS against the real
  * sf0.001 tables — catches schema drift (renamed column, dropped
  * table) without paying for execution (Verify covers that).
  */
class EntryContractSpec extends SparkSpec {

  private val RowsOnlyByDesign = Set(
    // q23 left this set in r13 (fixed literal profiles + integer
    // scoring replay exactly); q33 AND q25 left in r14 (the
    // splitmix64 streams are counter-based so the oracles regenerate
    // them closed-form; q25's band hash became md5-portable); q29
    // AND q114 left in r15 (integer-moments k-means — training,
    // assignment, probe routing and the per-subspace PQ codebooks +
    // integer ADC all replay in DuckDB).
    // q97: no SQL engine exposes deflate — exactness evidence lives
    // in CompressibilitySpec (driver-side java.util.zip parity)
    "q97_compressibility")

  test("every oracleSql key has a queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("rows-only queries are exactly the declared set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === RowsOnlyByDesign,
      "every new query needs an oracle, or an explicit declaration here")
  }

  test("every query analyzes against the sf0.001 tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf("sf0.001")).schema; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"unanalyzable queries:\n${failures.mkString("\n")}")
  }

  test("query output column names are unique and snake_case-safe") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sf("sf0.001")).schema.fieldNames.toSeq
      assert(cols.distinct === cols, s"$name: duplicate output columns $cols")
      cols.foreach(c => assert(!c.contains("(") && !c.contains(" "),
        s"$name: unaliased expression column '$c' would break the driver's column sort"))
    }
  }
}
