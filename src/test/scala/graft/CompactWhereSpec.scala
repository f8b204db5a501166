package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Selective compaction ([[VersionedParquetSink.compactWhere]] — Delta's
  * `OPTIMIZE ... WHERE`): fold ONLY the live dirs whose per-file stats
  * may match a predicate, leaving the rest untouched — at 100 TB the
  * difference between rewriting the table and rewriting yesterday's
  * micro-batch dirs. Covers: stats-scoped dir selection, content
  * preservation, time travel across the fold, vacuum of replaced dirs
  * (non-matching dirs survive), DV-mask materialization limited to the
  * folded dirs, streaming/CDF consumers skipping the fold, keyed
  * replay, the `CALL g.optimize(predicate => ...)` SQL face, clones,
  * and the `_delta_log` mirror's remove+add pair. */
class CompactWhereSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Base names of committed data dirs under `base/t`. */
  private def dataDirs(base: String, t: String): Set[String] =
    Option(new java.io.File(s"$base/$t").listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("d-"))
      .map(_.getName).toSet

  /** Three 'en' append dirs + two 'fr' append dirs on a fresh sink. */
  private def mixedTable(base: String): VersionedParquetSink = {
    val sink = new VersionedParquetSink(base)
    def batch(lang: String, lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, lang, s"doc$i")).toDF("id", "lang", "text")
    sink.append(batch("en", 1, 30), "t")
    sink.append(batch("en", 31, 60), "t")
    sink.append(batch("fr", 61, 80), "t")
    sink.append(batch("en", 81, 100), "t")
    sink.append(batch("fr", 101, 110), "t")
    sink
  }

  test("folds only the dirs whose stats may match; content preserved") {
    val base = TestSpark.tmpDir("cw1")
    val sink = mixedTable(base)
    val before = sink.read(spark, "t").collect().map(_.getLong(0)).toSet
    val dirsBefore = dataDirs(base, "t")

    val v = sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    assert(v == 5L)
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet == before)

    // time travel below the fold still resolves (markers + dirs kept)
    assert(sink.readAt(spark, "t", 1).count() == 60)

    // vacuum the superseded dirs: the three folded 'en' dirs go, BOTH
    // 'fr' dirs survive (they were never rewritten)
    val deleted = sink.vacuum(spark, "t", graceMs = 0L,
      includeSuperseded = true)
    assert(deleted == 3, s"expected the 3 folded en dirs deleted, got $deleted")
    val dirsAfter = dataDirs(base, "t")
    assert((dirsBefore -- dirsAfter).size == 3)
    assert((dirsAfter -- dirsBefore).size == 1) // the fold's own dir
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet == before)
  }

  test("no matching dirs, or a single match: nothing is committed") {
    val base = TestSpark.tmpDir("cw2")
    val sink = mixedTable(base)
    val v0 = sink.latestVersion(spark, "t").get
    // no dir can hold lang='zz'
    assert(sink.compactWhere(spark, "t", col("lang") === "zz") == v0)
    // only ONE dir holds id > 100 — nothing to fold
    assert(sink.compactWhere(spark, "t", col("id") > 105L) == v0)
    assert(sink.latestVersion(spark, "t").get == v0)
  }

  test("DV masks over folded dirs are materialized; other masks stay live") {
    val base = TestSpark.tmpDir("cw3")
    val sink = mixedTable(base)
    sink.deleteVectored(spark, "t", col("id") === 5L)   // in an en dir
    sink.deleteVectored(spark, "t", col("id") === 65L)  // in a fr dir
    val expected = sink.read(spark, "t").collect().map(_.getLong(0)).toSet
    assert(!expected.contains(5L) && !expected.contains(65L))

    sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet == expected)

    // after vacuuming the replaced dirs the fr mask must STILL apply
    sink.vacuum(spark, "t", graceMs = 0L, includeSuperseded = true)
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet == expected)
  }

  test("streaming tail and CDF both skip the fold (no duplicates)") {
    val base = TestSpark.tmpDir("cw4")
    val sink = mixedTable(base)
    val (cursor, _) = sink.streamSince(spark, "t", fromVersion = -1L)
    sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    sink.append(Seq((200L, "en", "new")).toDF("id", "lang", "text"), "t")

    // the tail past the fold delivers ONLY the new append
    val (_, tail) = sink.streamSince(spark, "t", cursor)
    assert(tail.collect().map(_.getLong(0)).toSeq == Seq(200L))

    // CDF over the whole range: inserts only, one row per appended row
    val changes = sink.changesBetween(spark, "t", -1L, 6L)
    assert(changes.filter(col("_change_type") =!= "insert").count() == 0)
    assert(changes.count() == 111)
  }

  test("keyed replay is a no-op; conflicting overlap aborts cleanly") {
    val base = TestSpark.tmpDir("cw5")
    val sink = mixedTable(base)
    val v = sink.compactWhere(spark, "t", col("lang") === "en", Some(1),
      commitKey = Some("opt-1"))
    assert(sink.compactWhere(spark, "t", col("lang") === "en", Some(1),
      commitKey = Some("opt-1")) == v)
    assert(sink.latestVersion(spark, "t").get == v)
    // a second (unkeyed) selective fold over the same predicate now
    // selects the single folded dir -> nothing to fold, no commit
    assert(sink.compactWhere(spark, "t", col("lang") === "en") == v)
  }

  test("full compaction after a selective fold: no duplicates") {
    val base = TestSpark.tmpDir("cw6")
    val sink = mixedTable(base)
    val before = sink.read(spark, "t").collect().map(_.getLong(0)).toSet
    sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    sink.compact(spark, "t", targetFiles = Some(1))
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet == before)
    assert(sink.read(spark, "t").count() == before.size.toLong)
  }

  test("CALL g.optimize(predicate => ...) — the SQL face, with zorder") {
    val base = TestSpark.tmpDir("cw7")
    mixedTable(base)
    spark.conf.set("spark.sql.catalog.gow",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gow.path", base)
    val msg = spark.sql(
      "CALL gow.optimize(table => 't', predicate => 'lang = \\'en\\'', " +
        "target_files => 1)").collect()(0).getString(0)
    assert(msg.contains("where lang"))
    assert(spark.sql("SELECT count(*) FROM gow.t").collect()(0).getLong(0)
      == 110L)
    // predicate + zorder_by: the folded output is clustered
    val msg2 = spark.sql(
      "CALL gow.optimize(table => 't', predicate => 'id < 200', " +
        "zorder_by => 'id', target_files => 2)").collect()(0).getString(0)
    assert(msg2.contains("z-ordered on id"))
    assert(spark.sql("SELECT count(*) FROM gow.t").collect()(0).getLong(0)
      == 110L)
  }

  test("a clone sees the source's fold; a fold ON the clone is local") {
    val base = TestSpark.tmpDir("cw8")
    val sink = mixedTable(base)
    sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    sink.cloneShallow(spark, "t", "c")
    // the clone's replayed replaces-marker matches the re-pointed
    // `../t/<dir>` spellings (base-name matching) — no duplicates
    assert(sink.read(spark, "c").count() == 110)

    // folding the CLONE's fr dirs writes into the clone, not the source
    val srcDirs = dataDirs(base, "t")
    sink.compactWhere(spark, "c", col("lang") === "fr", Some(1))
    assert(sink.read(spark, "c").count() == 110)
    assert(dataDirs(base, "t") == srcDirs, "fold on clone touched source")
    assert(sink.read(spark, "t").count() == 110)
  }

  test("REORG PURGE materializes masks folding only masked dirs") {
    val base = TestSpark.tmpDir("cwA")
    val sink = mixedTable(base)
    sink.deleteVectored(spark, "t", col("id") === 5L)  // masks dir 1 only
    sink.updateVectored(spark, "t", col("id") === 65L,
      Map("text" -> org.apache.spark.sql.functions.lit("edited")))
    val expected = sink.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(!expected.exists(_._1 == 5L) && expected.contains((65L, "edited")))

    val v = sink.reorgPurge(spark, "t", Some(1))
    assert(sink.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet == expected)
    // all masks retired: DESCRIBE DETAIL reports zero live DVs
    val detail = sink.describeDetail(spark, "t").collect()(0)
    assert(detail.getAs[Long]("numDeletionVectors") == 0L)
    // cost ∝ masked data: at least one untouched data dir survives the
    // superseded vacuum (only masked/update dirs + dv dirs were retired)
    val before = dataDirs(base, "t").size
    sink.vacuum(spark, "t", graceMs = 0L, includeSuperseded = true)
    assert(dataDirs(base, "t").size >= 2,
      "purge rewrote dirs the masks never touched")
    assert(sink.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet == expected)
    assert(before >= dataDirs(base, "t").size)
    assert(v == sink.latestVersion(spark, "t").get)
    // no live masks -> purge again is a no-op
    assert(sink.reorgPurge(spark, "t") == v)
  }

  test("CALL g.reorg — the SQL face") {
    val base = TestSpark.tmpDir("cwB")
    val sink = mixedTable(base)
    sink.deleteVectored(spark, "t", col("id") <= 3L)
    spark.conf.set("spark.sql.catalog.gor",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gor.path", base)
    val msg = spark.sql("CALL gor.reorg(table => 't', target_files => 1)")
      .collect()(0).getString(0)
    assert(msg.contains("purged"))
    assert(spark.sql("SELECT count(*) FROM gor.t").collect()(0).getLong(0)
      == 107L)
    assert(sink.describeDetail(spark, "t").collect()(0)
      .getAs[Long]("numDeletionVectors") == 0L)
  }

  test("the _delta_log mirror emits remove+add for the fold version") {
    val base = TestSpark.tmpDir("cw9")
    val sink = mixedTable(base)
    val v = sink.compactWhere(spark, "t", col("lang") === "en", Some(1))
    val log = new java.io.File(s"$base/t/_delta_log/" +
      f"$v%020d.json")
    assert(log.exists, s"mirror did not write version $v")
    val body = scala.io.Source.fromFile(log).mkString
    assert(body.contains("\"remove\""), "no remove actions for folded dirs")
    assert(body.contains("\"add\""), "no add action for the folded copy")
    // exactly the 3 en dirs' files removed (one file per append here)
    assert("\"remove\"".r.findAllIn(body).size >= 3)
  }
}
