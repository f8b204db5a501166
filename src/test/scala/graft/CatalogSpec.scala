package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** The V2 TableCatalog face ([[graft.sources.GraftCatalog]]): the full
  * table lifecycle in plain SQL — CREATE/INSERT/SELECT with VERSION AS
  * OF / TIMESTAMP AS OF time travel, the `.history` metadata table,
  * metadata-only ALTER TABLE, CALL maintenance procedures — with reads
  * planning through the engine's stats-skipping V1 relation (the
  * GraftCatalogReads substitution rule). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Register a fresh catalog name -> fresh base dir (catalog instances
    * are cached per name, so each test that needs isolation gets its
    * own name). */
  private def catalog(name: String): String = {
    val base = TestSpark.tmpDir(s"cat-$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path", base)
    base
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan):
        org.apache.spark.sql.execution.SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan — the catalog read " +
      "did not substitute the planner-integrated relation"))
  }

  test("SQL lifecycle: CREATE TABLE, INSERT INTO, SELECT, OVERWRITE, DROP") {
    catalog("gsql")
    spark.sql("CREATE TABLE gsql.ev (id BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM gsql.ev").count() == 0)
    spark.sql("INSERT INTO gsql.ev VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gsql.ev VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM gsql.ev").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // INSERT OVERWRITE = the sink's ACID rewrite (history preserved)
    spark.sql("INSERT OVERWRITE gsql.ev VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM gsql.ev").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(spark.sql("SELECT * FROM gsql.ev VERSION AS OF 2").count() == 3)
    // SHOW TABLES sees it; DROP TABLE removes it
    assert(spark.sql("SHOW TABLES IN gsql").collect()
      .map(_.getString(1)).toSet == Set("ev"))
    spark.sql("DROP TABLE gsql.ev")
    assert(spark.sql("SHOW TABLES IN gsql").count() == 0)
  }

  test("SQL time travel against sink-written fixtures") {
    val base = catalog("gtt")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // v0
    Thread.sleep(5)
    val cut = java.time.Instant.now()
    Thread.sleep(5)
    sink.append(Seq((3, "c")).toDF("id", "v"), "t") // v1
    assert(spark.sql("SELECT * FROM gtt.t").count() == 3)
    assert(spark.sql("SELECT * FROM gtt.t VERSION AS OF 0").count() == 2)
    assert(spark.sql(
      s"SELECT * FROM gtt.t TIMESTAMP AS OF '$cut'").count() == 2)
    assert(spark.sql(
      s"SELECT * FROM gtt.t TIMESTAMP AS OF '${java.time.Instant.now()}'")
      .count() == 3)
    // a time-traveled snapshot rejects writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gtt.t VERSION AS OF 0 VALUES (7, 'x')")
    }
    assert(e != null)
  }

  test(".history metadata table = DESCRIBE HISTORY") {
    val base = catalog("gh")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")
    sink.compact(spark, "t")
    val h = spark.sql(
      "SELECT version, operation, supersedes FROM gh.t.history").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L)) // newest first
    assert(h.head.getString(1) == "COMPACT")
    assert(h.head.getLong(2) == 1L)
  }

  test("reader-option time travel: versionAsOf / timestampAsOf") {
    val base = catalog("gv")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // v0
    sink.append(Seq((2, "b")).toDF("id", "v"), "t") // v1
    assert(spark.read.option("versionAsOf", 0).table("gv.t").count() == 1)
    assert(spark.read.option("versionAsOf", 1).table("gv.t")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // un-pinned read still sees latest
    assert(spark.read.table("gv.t").count() == 2)
    // timestampAsOf at v0's commit instant sees only v0
    val ts0 = spark.sql("SELECT timestamp FROM gv.t.history WHERE version = 0")
      .collect().head.getTimestamp(0).toInstant
    assert(spark.read.option("timestampAsOf", ts0.toString)
      .table("gv.t").count() == 1)
    // both pins at once is an error
    intercept[Exception] {
      spark.read.option("versionAsOf", 0)
        .option("timestampAsOf", ts0.toString).table("gv.t").collect()
    }
  }

  test("TBLPROPERTIES: CREATE ... TBLPROPERTIES, SET/UNSET, SHOW, survive compaction") {
    val base = catalog("gp")
    spark.sql("CREATE TABLE gp.t (id INT, v STRING) " +
      "TBLPROPERTIES ('team' = 'data', 'pii' = 'false')")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES gp.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("team").contains("data"))
    assert(props().get("pii").contains("false"))
    // CREATE ... TBLPROPERTIES is ONE atomic commit: version 0 already
    // carries the properties (no props-less window, and the created
    // table's version numbering matches a bare CREATE)
    assert(spark.sql("SELECT version FROM gp.t.history").collect()
      .map(_.getLong(0)).toSeq == Seq(0L),
      "CREATE with TBLPROPERTIES should be a single commit")
    // reserved keys (SET LOCATION arrives as SetProperty("location"))
    // must be rejected, not persisted as inert user properties
    intercept[Exception] {
      spark.sql("ALTER TABLE gp.t SET TBLPROPERTIES ('location' = '/elsewhere')")
    }
    assert(!props().contains("location"))
    spark.sql("ALTER TABLE gp.t SET TBLPROPERTIES ('pii' = 'true', 'tier' = 'gold')")
    assert(props().get("pii").contains("true"))
    assert(props().get("tier").contains("gold"))
    spark.sql("ALTER TABLE gp.t UNSET TBLPROPERTIES ('team')")
    assert(!props().contains("team"))
    // properties ride the commit log: compaction inherits them
    spark.sql("INSERT INTO gp.t VALUES (1, 'a')")
    new VersionedParquetSink(base).compact(spark, "t")
    assert(props().get("tier").contains("gold"), "compaction dropped props")
  }

  test(".changes metadata table = readChangeFeed on the format path") {
    val base = catalog("gc")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // v0
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")           // v1
    sink.delete(spark, "t", $"id" === 1)                      // v2 rewrite
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    // full-feed default (from before v0): the NET diff — the sink's
    // documented changesBetween semantics, identical to the format
    // path's feed over the same range — i.e. the live rows as inserts
    val full = canon(spark.sql(
      "SELECT id, v, _change_type FROM gc.t.changes").collect())
    assert(full == Seq((2, "b", "insert"), (3, "c", "insert")).sorted,
      s"full feed: $full")
    // bounded range via reader options == format-path readChangeFeed
    val viaTable = canon(spark.read
      .option("startingVersion", 1).option("endingVersion", 2)
      .table("gc.t.changes")
      .select("id", "v", "_change_type").collect())
    val viaFormat = canon(spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 2)
      .load(s"$base/t")
      .select("id", "v", "_change_type").collect())
    assert(viaTable == viaFormat,
      s"catalog CDF $viaTable != format CDF $viaFormat")
    assert(viaTable == Seq((1, "a", "delete"), (3, "c", "insert")).sorted)
  }

  test(".detail metadata table = DESCRIBE DETAIL") {
    val base = catalog("gd")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")
    sink.setProperties(spark, "t", Map("tier" -> "gold"))
    sink.deleteVectored(spark, "t", $"id" === 1)
    val d = spark.sql("SELECT * FROM gd.t.detail").collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getAs[String]("format") == "graft")
    assert(r.getAs[String]("name") == "t")
    assert(r.getAs[String]("location").endsWith("/t"))
    assert(r.getAs[Long]("numFiles") > 0)
    assert(r.getAs[Long]("sizeInBytes") > 0)
    assert(r.getAs[Map[String, String]]("properties")
      .get("tier").contains("gold"))
    assert(r.getAs[Long]("version") == 3L) // 2 appends + props + DV
    assert(r.getAs[Long]("numDeletionVectors") == 1L)
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN are metadata-only commits") {
    val base = catalog("gddl")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    spark.sql("ALTER TABLE gddl.t ADD COLUMN src STRING")
    assert(spark.sql("SELECT * FROM gddl.t").columns.toSeq
      == Seq("id", "v", "src"))
    assert(spark.sql("SELECT src FROM gddl.t").collect().head.isNullAt(0))
    spark.sql("ALTER TABLE gddl.t RENAME COLUMN src TO origin")
    assert(spark.sql("SELECT origin FROM gddl.t").count() == 1)
    spark.sql("ALTER TABLE gddl.t DROP COLUMN origin")
    assert(spark.sql("SELECT * FROM gddl.t").columns.toSeq == Seq("id", "v"))
    // three metadata commits, zero data files written
    assert(sink.versions(spark, "t") == Seq(0L, 1L, 2L, 3L))
    // time travel below the rename still shows the old name
    assert(spark.sql("SELECT * FROM gddl.t VERSION AS OF 1").columns.toSeq
      == Seq("id", "v", "src"))
  }

  test("catalog reads plan through the stats-skipping relation") {
    val base = catalog("gplan")
    val sink = new VersionedParquetSink(base)
    Seq.tabulate(3) { k =>
      sink.append(Seq.tabulate(10)(i => (k * 100 + i, s"r$i"))
        .toDF("id", "v").coalesce(1), "t")
    }
    val scan = scanOf(spark.sql("SELECT v FROM gplan.t WHERE id = 105"))
    // 1 of 3 files opened: the commit-log min/max stats pruned the rest
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 file scanned, got ${scan.metrics("numFiles").value}")
    // and the residual predicate is pushed to parquet
    assert(scan.metadata("PushedFilters").contains("EqualTo(id,105)"))
  }

  test("CALL procedures: optimize (zorder), restore, vacuum") {
    val base = catalog("gcall")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq.tabulate(20)(i => (i, i % 5, s"r$i"))
      .toDF("id", "k", "v"), "t")
    sink.append(Seq.tabulate(20)(i => (100 + i, i % 5, s"s$i"))
      .toDF("id", "k", "v"), "t")
    val msg = spark.sql(
      "CALL gcall.optimize(table => 't', zorder_by => 'id,k')")
      .collect().head.getString(0)
    assert(msg.contains("compacted 't'"))
    assert(spark.sql("SELECT * FROM gcall.t").count() == 40)
    val r = spark.sql("CALL gcall.restore(table => 't', version => 0)")
      .collect().head.getString(0)
    assert(r.contains("restored 't' to v0"))
    assert(spark.sql("SELECT * FROM gcall.t").count() == 20)
    // dry run (sink API with includeSuperseded so something IS
    // eligible): counts candidates, touches nothing — history below
    // the restore stays travelable
    val eligible = sink.vacuum(spark, "t", graceMs = 0L,
      includeSuperseded = true, dryRun = true)
    assert(eligible > 0, "restore left no superseded dirs to report")
    assert(spark.sql("SELECT * FROM gcall.t VERSION AS OF 0").count() == 20,
      "dry run must not delete anything")
    val dry = spark.sql(
      "CALL gcall.vacuum(table => 't', retain_hours => 0, dry_run => true)")
      .collect().head.getString(0)
    assert(dry.contains("dry run"), dry)
    // the real vacuum keeps every manifest-referenced dir by default
    spark.sql("CALL gcall.vacuum(table => 't', retain_hours => 0)")
    assert(spark.sql("SELECT * FROM gcall.t").count() == 20)
  }

  test("SQL DELETE rides the deletion-vector path") {
    val base = catalog("gdel")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq.tabulate(10)(i => (i, s"r$i")).toDF("id", "v"), "t")
    spark.sql("DELETE FROM gdel.t WHERE id >= 7 OR v = 'r0'")
    assert(spark.sql("SELECT count(*) AS n FROM gdel.t").head().getLong(0)
      == 6)
    // it was a positional mask commit (metadata-speed), not a rewrite
    val op = spark.sql(
      "SELECT operation FROM gdel.t.history ORDER BY version DESC")
      .head().getString(0)
    assert(op.toLowerCase.contains("dv"), s"expected a DV commit, got $op")
    // time travel below the delete still shows every row
    assert(spark.sql("SELECT * FROM gdel.t VERSION AS OF 0").count() == 10)
    // catalog reads compose with the live mask through the
    // substitution rule (format("graft") machinery underneath)
    assert(spark.sql("SELECT * FROM gdel.t WHERE id < 3").count() == 2)
    // a predicate outside the source-filter algebra fails the analysis
    // check loudly instead of silently rewriting the table
    intercept[Exception] {
      spark.sql("DELETE FROM gdel.t WHERE length(v) > 100")
    }
    assert(spark.sql("SELECT count(*) AS n FROM gdel.t").head().getLong(0)
      == 6)
  }

  test("SQL UPDATE rides the merge-on-read path, composes with DVs") {
    val base = catalog("gupd")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq.tabulate(10)(i => (i.toLong, s"r$i", 0L))
      .toDF("id", "v", "hits"), "t")
    // SET expressions may reference existing columns; WHERE is any
    // predicate; literals align to the column's declared type
    spark.sql("UPDATE gupd.t SET hits = hits + 1, v = concat(v, '!') " +
      "WHERE id >= 7")
    val rows = spark.sql("SELECT * FROM gupd.t ORDER BY id").collect()
    assert(rows.length == 10)
    assert(rows.filter(_.getLong(0) >= 7).forall(r =>
      r.getLong(2) == 1L && r.getString(1).endsWith("!")))
    assert(rows.filter(_.getLong(0) < 7).forall(r =>
      r.getLong(2) == 0L && !r.getString(1).endsWith("!")))
    // merge-on-read: an update commit (mask + images), not a rewrite
    val op = spark.sql(
      "SELECT operation FROM gupd.t.history ORDER BY version DESC")
      .head().getString(0)
    assert(op.toLowerCase.contains("update"),
      s"expected an update commit, got $op")
    // time travel below the update shows the old images
    assert(spark.sql(
      "SELECT sum(hits) AS s FROM gupd.t VERSION AS OF 0")
      .head().getLong(0) == 0L)
    // an unfiltered UPDATE touches every row
    spark.sql("UPDATE gupd.t SET hits = 9")
    assert(spark.sql("SELECT sum(hits) AS s FROM gupd.t")
      .head().getLong(0) == 90L)
    // stacks with a DV delete
    spark.sql("DELETE FROM gupd.t WHERE id = 0")
    spark.sql("UPDATE gupd.t SET hits = 0 WHERE id = 1")
    assert(spark.sql("SELECT sum(hits) AS s FROM gupd.t")
      .head().getLong(0) == 72L)
    assert(spark.sql("SELECT count(*) AS n FROM gupd.t")
      .head().getLong(0) == 9)
  }

  test("SQL MERGE INTO: upsert, update-only, delete, insert-only arms") {
    val base = catalog("gmrg")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"), "t")
    Seq((2L, "B", 200L), (4L, "d", 40L)).toDF("id", "v", "n")
      .createOrReplaceTempView("src")
    // the CDC upsert shape: SET * / INSERT *
    spark.sql("""MERGE INTO gmrg.t USING src ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT * FROM gmrg.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L), (4L, "d", 40L)))
    // update-only: unmatched source rows do NOT insert
    Seq((3L, "C", 300L), (9L, "x", 90L)).toDF("id", "v", "n")
      .createOrReplaceTempView("src2")
    spark.sql("""MERGE INTO gmrg.t USING src2 ON t.id = src2.id
      WHEN MATCHED THEN UPDATE SET *""")
    val afterUpd = spark.sql("SELECT * FROM gmrg.t ORDER BY id").collect()
    assert(afterUpd.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(afterUpd(2).getString(1) == "C")
    // matched-delete + insert of unmatched rows, one commit
    Seq((4L, "-", 0L), (5L, "e", 50L)).toDF("id", "v", "n")
      .createOrReplaceTempView("src3")
    spark.sql("""MERGE INTO gmrg.t USING src3 ON t.id = src3.id
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT * FROM gmrg.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    // insert-only (no matched arm): existing rows untouched
    Seq((3L, "zz", 0L), (6L, "f", 60L)).toDF("id", "v", "n")
      .createOrReplaceTempView("src4")
    spark.sql("""MERGE INTO gmrg.t USING src4 ON t.id = src4.id
      WHEN NOT MATCHED THEN INSERT *""")
    val fin = spark.sql("SELECT * FROM gmrg.t ORDER BY id").collect()
    assert(fin.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L, 6L))
    assert(fin(2).getString(1) == "C") // 3 not overwritten by insert-only
    // every verb above is a versioned commit — time travel intact
    assert(spark.sql("SELECT * FROM gmrg.t VERSION AS OF 0").count() == 3)
  }

  test("MERGE INTO rejects unsupported arms loudly") {
    val base = catalog("gmrgx")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a")).toDF("id", "v"), "t")
    Seq((1L, "A")).toDF("id", "v").createOrReplaceTempView("msrc")
    // conditional arms
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO gmrgx.t USING msrc ON t.id = msrc.id
        WHEN MATCHED AND t.v = 'a' THEN UPDATE SET *""")
    }
    assert(e1.getMessage.contains("conditional"), e1.getMessage)
    // non-equi ON
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO gmrgx.t USING msrc ON t.id > msrc.id
        WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e2.getMessage.contains("conjunction"), e2.getMessage)
    // WHEN NOT MATCHED BY SOURCE
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO gmrgx.t USING msrc ON t.id = msrc.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(e3.getMessage.contains("NOT MATCHED BY SOURCE"), e3.getMessage)
    // nothing was committed by any rejected statement
    assert(spark.sql("SELECT v FROM gmrgx.t").head().getString(0) == "a")
  }

  test("CTAS and the V1Scan fallback (no extensions rule needed)") {
    catalog("gctas")
    spark.sql("CREATE TABLE gctas.sq AS SELECT id, id * id AS sq " +
      "FROM range(10)")
    assert(spark.sql("SELECT sum(sq) FROM gctas.sq").collect()
      .head.getLong(0) == 285L)
    // the fallback path: call the table's own scan builder directly
    val cat = spark.sessionState.catalogManager.catalog("gctas")
      .asInstanceOf[graft.sources.GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "sq")).asInstanceOf[graft.sources.GraftTable]
    assert(t.readDF(spark).count() == 10)
  }
}
