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

  test("every query output schema is flat atomic (driver-hasher class)") {
    // The driver's pandas comparer sorts then hashes rows: DecimalType
    // broke q170 (r14/r15) and ArrayType broke q214 (r16) even though
    // the DuckDB compare passed. This spec closes the CLASS: no query
    // payload may carry a nested or decimal column — serialize vectors
    // as digit strings or explode to rows; keep rich types in library
    // APIs only.
    import org.apache.spark.sql.types._
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf("sf0.001")).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] ||
                  f.dataType.isInstanceOf[DecimalType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"nested/decimal query payloads (driver hasher cannot canonicalize):\n${offenders.mkString("\n")}")
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
