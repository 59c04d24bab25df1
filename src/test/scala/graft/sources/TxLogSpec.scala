package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_txlog").toString

  private def df(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("k", "s", "v")

  private def contents(table: String, asOf: Option[Long] = None): Set[(Long, String, Double)] =
    TxLog.read(spark, table, asOf).as[(Long, String, Double)].collect().toSet

  test("create + read round-trips rows and schema") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 0.5), (2L, "b", 1.5)), t)
    assert(contents(t) === Set((1L, "a", 0.5), (2L, "b", 1.5)))
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq === Seq("k", "s", "v"))
  }

  test("append adds rows; time travel sees each version's state") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 0.25)), t)
    TxLog.append(spark, df((2L, "b", 0.5)), t)
    TxLog.append(spark, df((3L, "c", 0.75)), t)
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L))
    assert(contents(t, Some(0L)).map(_._1) === Set(1L))
    assert(contents(t, Some(1L)).map(_._1) === Set(1L, 2L))
    assert(TxLog.history(t).map(_._2) === Seq("create", "append", "append"))
  }

  test("deleteWhere rewrites only stat-overlapping files; others survive verbatim") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)).repartition(1), t)
    TxLog.append(spark, df((100L, "x", 3.0), (200L, "y", 4.0)).repartition(1), t)
    val before = TxLog.snapshot(t, None).adds
    assert(before.size === 2)
    val untouched = before.values.find(_.stats("k").maxNum.exists(_ <= 2.0)).get.path
    TxLog.deleteWhere(spark, t, col("k") === 100L)
    val after = TxLog.snapshot(t, None).adds
    assert(after.contains(untouched), "low-key file must not be rewritten")
    assert(contents(t).map(_._1) === Set(1L, 2L, 200L))
  }

  test("deleteWhere with null-producing predicate keeps null rows (SQL semantics)") {
    val t = freshTable()
    val src = Seq((1L, Some("a"), 0.0), (2L, None: Option[String], 0.0), (3L, Some("b"), 0.0))
      .toDF("k", "s", "v")
    TxLog.create(spark, src, t)
    TxLog.deleteWhere(spark, t, col("s") === "a") // null = 'a' is null → not deleted
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("upsert replaces matched keys and appends new ones") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)), t)
    TxLog.upsert(spark, df((2L, "B", 20.0), (3L, "c", 3.0)), t, "k")
    assert(contents(t) === Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
  }

  test("upsert prunes by source key range") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)).repartition(1), t)
    TxLog.append(spark, df((100L, "x", 3.0)).repartition(1), t)
    val lowFile = TxLog.snapshot(t, None).adds.values
      .find(_.stats("k").maxNum.exists(_ <= 2.0)).get.path
    TxLog.upsert(spark, df((100L, "X", 30.0), (101L, "y", 4.0)), t, "k")
    assert(TxLog.snapshot(t, None).adds.contains(lowFile),
      "file outside the source key range must not be rewritten")
    assert(contents(t) === Set((1L, "a", 1.0), (2L, "b", 2.0), (100L, "X", 30.0), (101L, "y", 4.0)))
  }

  test("compact shrinks file count, preserves contents, read after vacuum intact") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t)
    (2L to 6L).foreach(i => TxLog.append(spark, df((i, s"s$i", i * 0.5)).repartition(1), t))
    val before = contents(t)
    assert(TxLog.snapshot(t, None).adds.size === 6)
    TxLog.compact(spark, t, smallBytes = 1L << 20)
    assert(TxLog.snapshot(t, None).adds.size === 1)
    assert(contents(t) === before)
    val removed = TxLog.vacuum(t)
    assert(removed.size === 6, "six superseded files vacuumed")
    assert(contents(t) === before)
  }

  test("snapshot via checkpoint equals full replay") {
    val t = freshTable()
    TxLog.create(spark, df((0L, "z", 0.0)), t)
    // cross the checkpoint interval so the snapshot path uses a checkpoint
    (1L to TxLog.checkpointInterval + 3L).foreach(i =>
      TxLog.append(spark, df((i, s"s$i", 0.0)).repartition(1), t))
    val dir = Paths.get(t, "_txlog")
    assert(Files.exists(dir.resolve(f"${TxLog.checkpointInterval}%020d.checkpoint.json")))
    assert(Files.exists(dir.resolve("_last_checkpoint")))
    val viaCk = TxLog.snapshot(t, None)
    // replay-from-zero ground truth: delete the checkpoint files and resnapshot
    Files.delete(dir.resolve(f"${TxLog.checkpointInterval}%020d.checkpoint.json"))
    Files.delete(dir.resolve("_last_checkpoint"))
    val full = TxLog.snapshot(t, None)
    assert(viaCk.adds === full.adds)
    assert(viaCk.version === full.version)
  }

  test("concurrent appends all land; losers retry into later versions") {
    val t = freshTable()
    TxLog.create(spark, df((0L, "z", 0.0)), t)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try TxLog.append(spark, df((i.toLong, s"t$i", 0.0)).repartition(1), t)
        catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"append failed: ${failures.peek()}")
    assert(TxLog.latestVersion(t) === Some(4L), "four appends → versions 1..4")
    assert(contents(t).map(_._1) === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("stats pruning is conservative and exact on eq/range/in/null") {
    val add = TxLog.AddFile("f.parquet", 10L, 100L, Map(
      "k" -> TxLog.ColStat(Some(0L), Some(10.0), Some(20.0), None, None),
      "s" -> TxLog.ColStat(Some(2L), None, None, Some("bb"), Some("dd"))))
    def may(c: org.apache.spark.sql.Column): Boolean =
      TxLog.mayMatch(add, org.apache.spark.sql.graft.Shims.expression(c))
    assert(!may(col("k") === 9))
    assert(may(col("k") === 10))
    assert(!may(col("k") > 20))
    assert(may(col("k") >= 20))
    assert(!may(col("k") < 10))
    assert(may(lit(15) < col("k")))
    assert(!may(lit(20) < col("k")))
    assert(!may(col("s") === "aa") && may(col("s") === "cc") && !may(col("s") === "ee"))
    assert(may(col("s").isin("aa", "cc")))
    assert(!may(col("s").isin("aa", "ee")))
    assert(may(col("s").isNull)) // nullCount 2 > 0
    assert(!may(col("k") === 9 && col("s") === "cc"), "one impossible conjunct prunes")
    assert(may(col("k") === 9 || col("s") === "cc"), "one possible disjunct keeps")
    // unknown shapes never prune
    assert(may(abs(col("k")) === 9))
    // missing column stats never prune
    assert(may(col("unknown") === 1))
  }

  test("prunedRead opens only overlapping files and still filters rows") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)).repartition(1), t)
    TxLog.append(spark, df((10L, "c", 3.0), (20L, "d", 4.0)).repartition(1), t)
    TxLog.append(spark, df((100L, "e", 5.0)).repartition(1), t)
    val (rows, scanned, total) = TxLog.prunedRead(spark, t, col("k") >= 10L && col("k") <= 20L)
    assert(total === 3 && scanned === 1)
    assert(rows.select("k").as[Long].collect().toSet === Set(10L, 20L))
    val (none, s0, t0) = TxLog.prunedRead(spark, t, col("k") === 50L)
    assert(t0 === 3 && s0 === 0 && none.count() === 0)
  }

  test("streamCommit is exactly-once per (app, batchId)") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)), t)
    assert(TxLog.streamCommit(spark, df((2L, "b", 2.0)), t, "appA", 0L))
    assert(!TxLog.streamCommit(spark, df((2L, "b", 2.0)), t, "appA", 0L), "replay is a no-op")
    assert(TxLog.streamCommit(spark, df((3L, "c", 3.0)), t, "appA", 1L))
    assert(TxLog.streamCommit(spark, df((4L, "d", 4.0)), t, "appB", 0L), "apps independent")
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L, 4L))
  }

  test("bloom skipping prunes scattered equality probes range stats cannot") {
    val t = freshTable()
    // keys interleaved mod 3: every file's [min, max] spans the whole
    // range, so min/max pruning keeps all files — blooms must do it.
    TxLog.create(spark, (0L until 300L by 3L).map(i => (i, s"v$i", 0.0))
      .toDF("k", "s", "v").repartition(1), t, bloomCols = Seq("k"))
    (1L to 2L).foreach(r =>
      TxLog.append(spark, (r until 300L by 3L).map(i => (i, s"v$i", 0.0))
        .toDF("k", "s", "v").repartition(1), t, bloomCols = Seq("k")))
    val snap = TxLog.snapshot(t, None)
    assert(snap.adds.size === 3)
    assert(snap.adds.values.forall(_.blooms.contains("k")), "blooms persisted through the log")
    // k = 7 lives in the r=1 file only
    val (rows, scanned, total) = TxLog.prunedRead(spark, t, col("k") === 7L)
    assert(total === 3 && scanned === 1, "bloom pruned the two files not containing 7")
    assert(rows.select("s").as[String].collect().toSeq === Seq("v7"))
    // absent key: all files pruned
    val (_, s0, _) = TxLog.prunedRead(spark, t, col("k") === 1000L)
    assert(s0 === 0)
    // string-keyed bloom probes work too (same canonical form)
    val t2 = freshTable()
    TxLog.create(spark, Seq((1L, "alpha", 0.0), (2L, "beta", 0.0)).toDF("k", "s", "v"),
      t2, bloomCols = Seq("s"))
    TxLog.append(spark, Seq((3L, "gamma", 0.0)).toDF("k", "s", "v"), t2, bloomCols = Seq("s"))
    val (_, s1, t1) = TxLog.prunedRead(spark, t2, col("s") === "zeta")
    assert(t1 >= 2 && s1 === 0, "absent string pruned everywhere")
    // no false negatives: a present key always keeps its file
    val (r2, _, _) = TxLog.prunedRead(spark, t2, col("s") === "gamma")
    assert(r2.count() === 1L)
  }

  test("z-order cluster preserves contents and makes 2-D box pruning effective") {
    val t = freshTable()
    // 64x64 grid scattered across files in row-major order: every
    // file's y range spans the whole domain → y predicates cannot
    // prune before clustering.
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong, (x * 64 + y).toLong)
    TxLog.create(spark, grid.toDF("x", "y", "id").repartition(8), t)
    val before = TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet
    val box = col("x") >= 8L && col("x") <= 15L && col("y") >= 8L && col("y") <= 15L
    val (_, s0, t0) = TxLog.prunedRead(spark, t, box)
    assert(s0 === t0, "row-major random layout: box touches every file")
    TxLog.cluster(spark, t, "x", "y", nFiles = 16)
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet === before,
      "clustering must not change contents")
    val (rows, s1, t1) = TxLog.prunedRead(spark, t, box)
    assert(t1 === 16)
    assert(s1 < t1 / 2, s"z-clustered box should prune most files (scanned $s1 of $t1)")
    assert(rows.count() === 64L, "8x8 box")
    assert(TxLog.history(t).last._2 === "cluster")
  }

  test("change feed: updates surface as delete+insert, moved rows cancel") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).repartition(1), t)
    TxLog.upsert(spark, df((2L, "B", 20.0), (4L, "d", 4.0)), t, "k") // v1
    TxLog.deleteWhere(spark, t, col("k") === 3L)                      // v2
    val ch = TxLog.changes(spark, t, 0L, 2L)
      .as[(Long, String, Double, String)].collect().toSet
    assert(ch === Set(
      (2L, "b", 2.0, "delete"), (2L, "B", 20.0, "insert"), // update pair
      (4L, "d", 4.0, "insert"),
      (3L, "c", 3.0, "delete")),
      s"row 1 was rewritten into new files both times but must cancel; got $ch")
    // sub-interval: only the delete
    assert(TxLog.changes(spark, t, 1L, 2L)
      .as[(Long, String, Double, String)].collect().toSet === Set((3L, "c", 3.0, "delete")))
    // empty interval
    assert(TxLog.changes(spark, t, 2L, 2L).count() === 0L)
  }

  test("deletion vectors hide rows without rewriting files; merge, compact, CDC compose") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).repartition(1), t)
    TxLog.append(spark, df((10L, "x", 10.0), (11L, "y", 11.0)).repartition(1), t)
    val filesBefore = TxLog.snapshot(t, None).adds.keySet

    TxLog.deleteWhereDV(spark, t, col("k") === 2L || col("k") === 10L)
    val s1 = TxLog.snapshot(t, None)
    assert(s1.adds.keySet === filesBefore, "DV delete must not rewrite any data file")
    assert(s1.dvs.size === 2 && s1.dvs.values.map(_.hidden).sum === 2L)
    assert(contents(t).map(_._1) === Set(1L, 3L, 4L, 11L))
    // pruned reads apply the vector too
    val (rows, _, _) = TxLog.prunedRead(spark, t, col("k") <= 4L)
    assert(rows.select("k").as[Long].collect().toSet === Set(1L, 3L, 4L))

    // second DV delete merges with the first (no double-hide, no rewrite)
    TxLog.deleteWhereDV(spark, t, col("k") === 3L)
    val s2 = TxLog.snapshot(t, None)
    assert(s2.adds.keySet === filesBefore)
    assert(s2.dvs.values.map(_.hidden).sum === 3L)
    assert(contents(t).map(_._1) === Set(1L, 4L, 11L))

    // time travel: before any DV, all six rows
    assert(contents(t, Some(1L)).size === 6)
    // CDC across the DV interval: pure deletes, no inserts
    val ch = TxLog.changes(spark, t, 1L, 3L)
      .as[(Long, String, Double, String)].collect().toSet
    assert(ch === Set((2L, "b", 2.0, "delete"), (10L, "x", 10.0, "delete"),
      (3L, "c", 3.0, "delete")))

    // rewrite-style delete on a DV'd file reads the effective view and
    // retires the vector with the file
    TxLog.deleteWhere(spark, t, col("k") === 11L)
    val s3 = TxLog.snapshot(t, None)
    assert(contents(t).map(_._1) === Set(1L, 4L))
    assert(s3.dvs.keySet.forall(s3.adds.contains), "no orphan DV entries")

    // compaction materializes remaining vectors away
    TxLog.compact(spark, t, smallBytes = 1L << 20)
    val s4 = TxLog.snapshot(t, None)
    assert(s4.dvs.isEmpty, "compaction materializes deletion vectors")
    assert(contents(t).map(_._1) === Set(1L, 4L))
    // vacuum cleans the now-unreferenced DV sidecars
    val removed = TxLog.vacuum(t)
    assert(removed.exists(_.startsWith("_dv/")), "stale DV sidecars vacuumed")
    assert(contents(t).map(_._1) === Set(1L, 4L))
  }

  test("restore rolls the table back as a new commit; history stays reachable") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)), t)
    TxLog.append(spark, df((3L, "c", 3.0)), t)                // v1: the good state
    TxLog.deleteWhere(spark, t, col("k") <= 2L)               // v2: the mistake
    TxLog.deleteWhereDV(spark, t, col("k") === 3L)            // v3: worse
    assert(contents(t).isEmpty)
    val v = TxLog.restore(spark, t, 1L)
    assert(v === 4L, "restore is a NEW commit")
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L))
    assert(contents(t, Some(3L)).isEmpty, "the rolled-back state is still reachable")
    assert(TxLog.history(t).last._2 === "restore")
    // restore into a DV'd state round-trips the vector too
    TxLog.restore(spark, t, 3L)
    assert(contents(t).isEmpty)
    assert(TxLog.snapshot(t, None).dvs.nonEmpty)
  }

  test("append rejects a mismatched schema (evolution goes through overwrite)") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)), t)
    val e = intercept[IllegalArgumentException](
      TxLog.append(spark, Seq((2L, 2L)).toDF("k", "n"), t))
    assert(e.getMessage.contains("schema"))
    TxLog.overwrite(spark, Seq((2L, 2L)).toDF("k", "n"), t) // the sanctioned path
    TxLog.append(spark, Seq((3L, 3L)).toDF("k", "n"), t)
    assert(TxLog.read(spark, t).as[(Long, Long)].collect().toSet === Set((2L, 2L), (3L, 3L)))
  }

  test("retention vacuum keeps the window's time travel, drops older files") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t)       // v0
    TxLog.overwrite(spark, df((2L, "b", 2.0)).repartition(1), t)    // v1
    TxLog.overwrite(spark, df((3L, "c", 3.0)).repartition(1), t)    // v2
    val removed = TxLog.vacuumKeeping(t, keepVersions = 2)
    assert(removed.size === 1, "only v0's file falls outside the 2-version window")
    assert(contents(t, Some(1L)).map(_._1) === Set(2L), "window versions still readable")
    assert(contents(t).map(_._1) === Set(3L))
    intercept[Exception](contents(t, Some(0L)).map(_._1)) // pre-window version gone
    assert(TxLog.vacuumKeeping(t, 2).isEmpty, "idempotent")
  }

  test("stageWrite runs its footer/stats/bloom walk as a cluster job, one task per staged file") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import scala.jdk.CollectionConverters._
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.add(sc.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val t = freshTable()
      TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
        .repartition(4), t, bloomCols = Seq("k"))
      // the parquet write's result stage AND the stats walk each run 4
      // tasks (one per staged part) — the walk itself refuses to run
      // outside a task (statsOfStagedFile's TaskContext require), so a
      // driver-side regression would fail every test in this suite
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline && stages.asScala.count(_ == 4) < 2)
        Thread.sleep(50)
      assert(stages.asScala.count(_ == 4) >= 2,
        s"expected a 4-task write stage and a 4-task stats stage; saw $stages")
      val snap = TxLog.snapshot(t, None)
      assert(snap.adds.values.map(_.rows).sum === 4L)
      assert(snap.adds.values.forall(f => f.stats.contains("k") && f.blooms.contains("k")),
        "task-computed stats and blooms round-tripped into the log")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("optimistic rebase: disjoint commits land; read-set and schema conflicts throw") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t) // v0 → file f0
    val f0 = TxLog.snapshot(t, None).adds.keySet.head
    TxLog.append(spark, df((2L, "b", 2.0)).repartition(1), t) // v1: the interleaved commit
    // a commit planned at v1 with an empty read set rebases to v2
    assert(TxLog.commitWithRebase(t, 1L, Seq(TxLog.CommitInfo("noop")), Set.empty, "noop") === 2L)
    TxLog.deleteWhere(spark, t, col("k") === 1L)              // v3: removes f0
    // a stale commit whose read set lost a file must re-plan
    intercept[TxLog.ConcurrentWriteException](
      TxLog.commitWithRebase(t, 3L, Seq(TxLog.CommitInfo("stale")), Set(f0), "stale"))
    TxLog.overwrite(spark, Seq((1L, 1L)).toDF("k", "n"), t)   // v4: schema change
    intercept[TxLog.ConcurrentWriteException](
      TxLog.commitWithRebase(t, 4L, Seq(TxLog.CommitInfo("x")), Set.empty, "x"))
    val base = TxLog.latestVersion(t).get
    TxLog.append(spark, Seq((2L, 2L)).toDF("k", "n"), t)
    // exclusive ops (overwrite/restore) conflict with any data commit
    intercept[TxLog.ConcurrentWriteException](
      TxLog.commitWithRebase(t, base + 1, Seq(TxLog.CommitInfo("ow")), Set.empty, "ow",
        exclusive = true))
  }

  test("an append racing a DV delete: both land (WriteSerializable)") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)).repartition(1), t)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val a = new Thread(() => {
      try TxLog.append(spark, df((10L, "x", 0.0)).repartition(1), t)
      catch { case e: Throwable => failures.add(e) }
    })
    val b = new Thread(() => {
      try TxLog.deleteWhereDV(spark, t, col("k") === 1L)
      catch { case e: Throwable => failures.add(e) }
    })
    a.start(); b.start(); a.join(); b.join()
    assert(failures.isEmpty, s"racing commits must both land: ${failures.peek()}")
    assert(contents(t).map(_._1) === Set(2L, 10L))
  }

  test("additive schema evolution: metadata-only commit, old files read as nulls") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t)
    val filesBefore = TxLog.snapshot(t, None).adds.keySet
    TxLog.addColumn(t, "tag STRING")
    assert(TxLog.snapshot(t, None).adds.keySet === filesBefore, "no data rewrite")
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq === Seq("k", "s", "v", "tag"))
    TxLog.append(spark, Seq((2L, "b", 2.0, "fresh")).toDF("k", "s", "v", "tag"), t)
    assert(TxLog.read(spark, t).as[(Long, String, Double, Option[String])].collect().toSet ===
      Set((1L, "a", 1.0, None), (2L, "b", 2.0, Some("fresh"))))
    // the pre-evolution schema no longer appends
    intercept[IllegalArgumentException](TxLog.append(spark, df((3L, "c", 3.0)), t))
    // non-nullable and duplicate additions are rejected
    intercept[IllegalArgumentException](TxLog.addColumn(t, "k2 BIGINT NOT NULL"))
    intercept[IllegalArgumentException](TxLog.addColumn(t, "k BIGINT"))
    // time travel before the evolution shows the old schema
    assert(TxLog.read(spark, t, Some(0L)).schema.fieldNames.toSeq === Seq("k", "s", "v"))
    // row-level ops span mixed-schema files: old file has no 'tag'
    // stats at all → conservative victim; new file's nullCount=0 prunes
    TxLog.deleteWhere(spark, t, col("tag").isNull)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().toSeq === Seq(2L))
    // change feed across the evolution reads both sides under the new schema
    assert(TxLog.changes(spark, t, 0L, 3L).columns.contains("tag"))
  }

  test("a failing checkpoint write does not fail the commit and is observable") {
    val t = freshTable()
    TxLog.create(spark, df((0L, "z", 0.0)).repartition(1), t)
    // sabotage the interval checkpoint target: a NON-EMPTY directory at
    // its path makes the atomic rename fail every time
    val ck = Paths.get(t, "_txlog", f"${TxLog.checkpointInterval}%020d.checkpoint.json")
    Files.createDirectories(ck)
    Files.write(ck.resolve("block"), Array[Byte](1))
    (1L to TxLog.checkpointInterval.toLong).foreach(i =>
      TxLog.append(spark, df((i, s"s$i", 0.0)).repartition(1), t))
    assert(TxLog.latestVersion(t) === Some(TxLog.checkpointInterval.toLong),
      "commits survive the checkpoint failure")
    assert(TxLog.checkpointFailures(t).exists(_.startsWith(s"${TxLog.checkpointInterval} ")),
      s"failure recorded; got ${TxLog.checkpointFailures(t)}")
    // the unreadable checkpoint degrades snapshot to full replay
    assert(contents(t).size === TxLog.checkpointInterval + 1)
  }

  test("failing checkpoint retries stay clean: no temp debris, capped failure log") {
    val t = freshTable()
    TxLog.create(spark, df((0L, "z", 0.0)).repartition(1), t)
    val logDir = Paths.get(t, "_txlog")
    val ck = logDir.resolve(f"${TxLog.checkpointInterval}%020d.checkpoint.json")
    Files.createDirectories(ck)
    Files.write(ck.resolve("block"), Array[Byte](1))
    // a long-failing history: the recorder must cap, not grow forever
    Files.write(logDir.resolve("_checkpoint_failures"),
      (1 to 150).map(i => s"$i fake.Exception: prior").mkString("", "\n", "\n").getBytes)
    (1L to TxLog.checkpointInterval.toLong).foreach(i =>
      TxLog.append(spark, df((i, s"s$i", 0.0)).repartition(1), t))
    val fails = TxLog.checkpointFailures(t)
    assert(fails.size <= 100, s"failure log capped, got ${fails.size}")
    assert(fails.last.startsWith(s"${TxLog.checkpointInterval} "), "newest failure kept")
    val s = Files.list(logDir)
    val tmps =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith(".tmp-")).toList
      } finally s.close()
    assert(tmps.isEmpty, s"no .tmp- debris after failed checkpoints: $tmps")
  }

  test("vacuum survives a corrupt checkpoint: degrades to log replay, deletes only junk") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t)
    (1L to TxLog.checkpointInterval.toLong).foreach(i =>
      TxLog.append(spark, df((i + 1L, s"s$i", 0.0)).repartition(1), t))
    val ck = Paths.get(t, "_txlog", f"${TxLog.checkpointInterval}%020d.checkpoint.json")
    assert(Files.exists(ck), "interval checkpoint written")
    Files.write(ck, "{torn garbage not an action".getBytes)
    val before = contents(t)
    TxLog.overwrite(spark, df((99L, "w", 9.0)).repartition(1), t)
    val removed = TxLog.vacuum(t) // everReferenced must skip the corrupt file
    assert(removed.nonEmpty, "superseded pre-overwrite files vacuumed")
    assert(contents(t) === Set((99L, "w", 9.0)), "live state intact after vacuum")
    assert(before.size === TxLog.checkpointInterval + 1, "pre-overwrite replay was complete")
  }

  test("vacuum spares young never-referenced files (in-flight staged), deletes aged junk") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)).repartition(1), t)
    TxLog.overwrite(spark, df((2L, "b", 2.0)).repartition(1), t)
    // simulate another writer's staged-but-uncommitted file: real
    // parquet bytes under a name no log version has ever referenced
    val stagedName = java.util.UUID.randomUUID().toString + ".parquet"
    val anyLive = TxLog.snapshot(t, None).adds.keySet.head
    Files.copy(Paths.get(t, anyLive), Paths.get(t, stagedName))
    val removed = TxLog.vacuum(t)
    assert(removed.size === 1 && !removed.contains(stagedName),
      s"the superseded v0 file goes; the in-flight staged file survives: $removed")
    // aged past the grace window it is junk, not an in-flight write
    Files.setLastModifiedTime(Paths.get(t, stagedName),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - TxLog.stagedGraceMs - 60000))
    assert(TxLog.vacuum(t) === Seq(stagedName))
  }

  test("a malformed stagedGraceMs knob falls back to the default, never crashes vacuum") {
    val prev = sys.props.get("graft.txlog.stagedGraceMs")
    try {
      System.setProperty("graft.txlog.stagedGraceMs", "not-a-number")
      assert(TxLog.stagedGraceMs === 20L * 60 * 1000)
      System.setProperty("graft.txlog.stagedGraceMs", "1234")
      assert(TxLog.stagedGraceMs === 1234L)
    } finally prev match {
      case Some(v) => System.setProperty("graft.txlog.stagedGraceMs", v)
      case None => System.clearProperty("graft.txlog.stagedGraceMs"); ()
    }
  }

  test("unknown null counts never prune; known ones prune exactly") {
    def may(f: TxLog.AddFile, c: org.apache.spark.sql.Column): Boolean =
      TxLog.mayMatch(f, org.apache.spark.sql.graft.Shims.expression(c))
    def file(nc: Option[Long]) = TxLog.AddFile("f.parquet", 10L, 100L,
      Map("s" -> TxLog.ColStat(nc, None, None, Some("a"), Some("b"))))
    assert(may(file(None), col("s").isNull) && may(file(None), col("s").isNotNull))
    assert(!may(file(Some(0L)), col("s").isNull) && may(file(Some(0L)), col("s").isNotNull))
    assert(may(file(Some(10L)), col("s").isNull) && !may(file(Some(10L)), col("s").isNotNull))
  }

  test("cluster on a fully DV-hidden table is a no-op") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0), (2L, "b", 2.0)).repartition(1), t)
    TxLog.deleteWhereDV(spark, t, lit(true))
    val v = TxLog.snapshot(t, None).version
    assert(TxLog.cluster(spark, t, "k", "v", nFiles = 4) === v)
    assert(contents(t).isEmpty)
  }

  test("overwrite replaces contents and can change schema") {
    val t = freshTable()
    TxLog.create(spark, df((1L, "a", 1.0)), t)
    TxLog.overwrite(spark, Seq((9L, 9L)).toDF("k", "n"), t)
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq === Seq("k", "n"))
    assert(TxLog.read(spark, t).as[(Long, Long)].collect().toSet === Set((9L, 9L)))
    // time travel across the schema change still works
    assert(contents(t, Some(0L)) === Set((1L, "a", 1.0)))
  }
}
