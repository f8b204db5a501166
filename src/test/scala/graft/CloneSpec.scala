package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Shallow clone ([[VersionedParquetSink.cloneShallow]]): a table copy
  * that writes ONLY commit markers — the clone's commits reference the
  * source table's data directories, so cloning a 100 TB table moves no
  * data. Covers: metadata-only creation, content equality incl. time
  * travel, full isolation of post-clone writes in both directions,
  * deletion-vector composition across the table boundary, governance
  * carry-over, chained-clone flattening, vacuum safety, stats-pruned and
  * format("graft") reads, and the `CALL g.clone(...)` procedure. */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFilesUnder(dir: String): Seq[String] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      if (!d.isDirectory) Seq.empty
      else d.listFiles.toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(dir)).map(_.getAbsolutePath)
      .filter(_.endsWith(".parquet"))
  }

  test("clone is metadata-only; contents, history and time travel match") {
    val base = TestSpark.tmpDir("clone1")
    val sink = new VersionedParquetSink(base)
    sink.append((1 to 50).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((51 to 80).map(i => (i, s"v$i")).toDF("id", "v"), "t")

    val v = sink.cloneShallow(spark, "t", "c")
    assert(v == 1L)
    // no data files were copied — the clone dir holds markers only
    assert(parquetFilesUnder(s"$base/c").isEmpty,
      "shallow clone copied data files")
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (1 to 80).toSet)
    // the full manifest came over: time travel below the clone point
    assert(sink.readAt(spark, "c", 0).count() == 50)
    assert(sink.history(spark, "c").count() == sink.history(spark, "t").count())
  }

  test("post-clone writes are isolated in BOTH directions") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone2"))
    sink.append((1 to 20).map(i => (i, i.toLong)).toDF("id", "n"), "t")
    sink.cloneShallow(spark, "t", "c")

    sink.append(Seq((100, 100L)).toDF("id", "n"), "c") // clone gains a row
    sink.append(Seq((200, 200L)).toDF("id", "n"), "t") // source gains another
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (1 to 20).toSet + 100)
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet ==
      (1 to 20).toSet + 200)
  }

  test("deletion vectors compose across the clone boundary") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone3"))
    sink.append((1 to 30).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.deleteVectored(spark, "t", col("id") <= 5) // pre-clone mask
    sink.cloneShallow(spark, "t", "c")
    // the source's mask came over with the manifest
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (6 to 30).toSet)
    // a DV on the CLONE masks rows living in SOURCE-owned files ...
    sink.deleteVectored(spark, "c", col("id") > 25)
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (6 to 25).toSet)
    // ... without affecting the source; and a post-clone source delete
    // stays invisible to the clone (its manifest is frozen at clone time)
    sink.deleteVectored(spark, "t", col("id") === 10)
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet ==
      (6 to 30).toSet - 10)
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (6 to 25).toSet)
  }

  test("governance (CHECK constraints) carries over to the clone") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone4"))
    sink.append(Seq((1, 10L)).toDF("id", "n"), "t")
    sink.addConstraint(spark, "t", "pos_n", "n > 0")
    sink.cloneShallow(spark, "t", "c")
    intercept[Exception] {
      sink.append(Seq((2, -1L)).toDF("id", "n"), "c")
    }
    sink.append(Seq((3, 3L)).toDF("id", "n"), "c")
    assert(sink.read(spark, "c").count() == 2)
  }

  test("chained clones flatten: a clone of a clone references the original") {
    val base = TestSpark.tmpDir("clone5")
    val sink = new VersionedParquetSink(base)
    sink.append((1 to 10).map(i => (i, i)).toDF("id", "n"), "t")
    sink.cloneShallow(spark, "t", "c1")
    sink.cloneShallow(spark, "c1", "c2")
    assert(sink.read(spark, "c2").count() == 10)
    // marker bodies point straight at ../t/..., never stack ../c1/../t
    val markers = new java.io.File(s"$base/c2/_commits").listFiles.toSeq
      .filter(_.getName.endsWith(".commit"))
      .map(f => scala.io.Source.fromFile(f).mkString)
    assert(markers.nonEmpty)
    markers.foreach { body =>
      assert(body.contains("\"dir\":\"../t/"), body)
      // base64 payloads can contain "c1" by chance — check the dir FIELD
      assert(!body.contains("../c1"), s"chained clone did not flatten: $body")
    }
  }

  test("vacuum on the clone never deletes source data") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone6"))
    sink.append((1 to 40).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.cloneShallow(spark, "t", "c")
    // make the cloned dirs superseded IN THE CLONE, then vacuum hard
    sink.compact(spark, "c")
    sink.vacuum(spark, "c", graceMs = 0L, includeSuperseded = true)
    // the source is untouched — vacuum only lists the clone's own dir
    assert(sink.read(spark, "t").count() == 40)
    assert(sink.read(spark, "c").count() == 40)
  }

  test("clone-aware vacuum: source vacuum keeps dirs a live clone reads") {
    // the Delta hazard this protocol closes: compact + hard-vacuum the
    // SOURCE — without the _clones breadcrumb the superseded original
    // dirs (the clone's entire content) would be deleted
    val base = TestSpark.tmpDir("clone8")
    val sink = new VersionedParquetSink(base)
    sink.append((1 to 40).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.cloneShallow(spark, "t", "c")
    sink.compact(spark, "t")
    val deleted = sink.vacuum(spark, "t", graceMs = 0L,
      includeSuperseded = true)
    assert(deleted == 0, s"vacuum deleted $deleted clone-held dir(s)")
    assert(sink.read(spark, "c").count() == 40) // clone still whole
    assert(sink.read(spark, "t").count() == 40)

    // dropping the clone releases the hold: the stale breadcrumb is
    // collected and the superseded dirs become vacuumable
    def rm(fl: java.io.File): Unit = {
      Option(fl.listFiles).foreach(_.foreach(rm)); fl.delete(); ()
    }
    rm(new java.io.File(s"$base/c"))
    val freed = sink.vacuum(spark, "t", graceMs = 0L,
      includeSuperseded = true)
    assert(freed > 0, "dropping the clone should release its dirs")
    assert(sink.read(spark, "t").count() == 40)
    assert(!new java.io.File(s"$base/t/_clones/c").exists,
      "stale breadcrumb not collected")
  }

  test("stats-pruned and format(\"graft\") reads work on the clone") {
    val base = TestSpark.tmpDir("clone7")
    val sink = new VersionedParquetSink(base)
    // three appends -> three dirs with disjoint id ranges (prunable)
    sink.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((101 to 200).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((201 to 300).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.deleteVectored(spark, "t", col("id") === 250)
    sink.cloneShallow(spark, "t", "c")
    assert(sink.readWhere(spark, "c", col("id") between (150, 160))
      .count() == 11)
    // the planner-integrated path (format reader over the clone dir):
    // file listing, stats skipping and the live DV mask all resolve
    // through the re-pointed dirs
    val df = spark.read.format("graft").load(s"$base/c")
    assert(df.count() == 299)
    assert(df.filter(col("id") === 250).count() == 0)
  }

  test("clone composes with column mapping: renamed schema + stats pruning") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone10"))
    sink.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((101 to 200).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.renameColumn(spark, "t", "id", "doc_id") // freezes physical names
    sink.cloneShallow(spark, "t", "c")
    // the clone reads under the RENAMED logical schema (mapping carried)
    val c = sink.read(spark, "c")
    assert(c.columns.toSeq == Seq("doc_id", "v"))
    assert(c.count() == 200)
    // stats skipping resolves through the mapping on re-pointed dirs
    assert(sink.readWhere(spark, "c", col("doc_id") between (50, 60))
      .count() == 11)
    // appends to the clone translate through the carried mapping and
    // stay isolated from the source
    sink.append(Seq((201, "x")).toDF("doc_id", "v"), "c")
    assert(sink.read(spark, "c").count() == 201)
    assert(sink.read(spark, "t").count() == 200)
  }

  test("breadcrumb grace window: a just-registered clone survives vacuum") {
    // cloneShallow writes the breadcrumb BEFORE its markers; a vacuum
    // racing that window must not collect the young breadcrumb (default
    // grace), while a stale one past the grace IS collected
    val base = TestSpark.tmpDir("clone11")
    val sink = new VersionedParquetSink(base)
    sink.append((1 to 10).map(i => (i, i)).toDF("id", "n"), "t")
    // simulate the mid-clone state: breadcrumb present, no clone commits
    val bc = new java.io.File(s"$base/t/_clones")
    bc.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/t/_clones/pending"),
      "pending".getBytes("UTF-8"))
    sink.vacuum(spark, "t") // default grace: the young breadcrumb stays
    assert(new java.io.File(s"$base/t/_clones/pending").exists,
      "vacuum collected a breadcrumb inside the grace window")
    sink.vacuum(spark, "t", graceMs = 0L) // past grace: collected
    assert(!new java.io.File(s"$base/t/_clones/pending").exists)
  }

  test("pending clone (young breadcrumb, no commits) holds superseded " +
      "dirs against an includeSuperseded vacuum") {
    // a VERSION AS OF clone may be about to reference superseded dirs;
    // while its breadcrumb is young but its manifest is empty (the
    // mid-clone window) the vacuum cannot know WHICH dirs — it must
    // hold all of them
    val base = TestSpark.tmpDir("clone12")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    sink.overwrite(Seq((2, "b")).toDF("id", "v"), "t") // v0 dir superseded
    val td = new java.io.File(s"$base/t")
    def dataDirs = td.listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("d-"))
    // age every data dir well past the grace period
    dataDirs.foreach(
      _.setLastModified(System.currentTimeMillis() - 86400000L))
    new java.io.File(s"$base/t/_clones").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/t/_clones/pending"),
      "pending".getBytes("UTF-8"))
    val before = dataDirs.size
    sink.vacuum(spark, "t", includeSuperseded = true) // default grace
    assert(dataDirs.size == before,
      "vacuum deleted superseded dirs while a clone was in flight")
    // breadcrumb gone stale (no clone log ever appeared): next
    // includeSuperseded pass collects both it and the superseded dir
    new java.io.File(s"$base/t/_clones/pending")
      .setLastModified(System.currentTimeMillis() - 86400000L)
    sink.vacuum(spark, "t", includeSuperseded = true)
    assert(dataDirs.size < before, "stale breadcrumb kept holding dirs")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("clone at a version: the clone is the source AS OF v") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("clone9"))
    sink.append((1 to 10).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((11 to 20).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    val v = sink.cloneShallow(spark, "t", "c", versionAsOf = Some(0L))
    assert(v == 0L)
    assert(sink.read(spark, "c").collect().map(_.getInt(0)).toSet ==
      (1 to 10).toSet)
    // the source's v1 append never leaks into the clone
    assert(sink.read(spark, "t").count() == 20)
    // readAt's inclusive-<= rule applies; below the first version throws
    intercept[IllegalArgumentException] {
      sink.cloneShallow(spark, "t", "c2", versionAsOf = Some(-1L))
    }
  }

  test("CALL g.restore(timestamp => ...) resolves like timestampAsOf") {
    val name = "grt"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path",
      TestSpark.tmpDir(s"cat-$name"))
    spark.sql(s"CREATE TABLE $name.t (id INT) USING graft")
    spark.sql(s"INSERT INTO $name.t VALUES (1)")
    Thread.sleep(1100) // marker timestamps have second granularity headroom
    val cut = java.time.Instant.now
    Thread.sleep(1100)
    spark.sql(s"INSERT INTO $name.t VALUES (2)")
    spark.sql(s"CALL $name.restore(table => 't', timestamp => '$cut')")
    assert(spark.sql(s"SELECT * FROM $name.t").collect()
      .map(_.getInt(0)).toSet == Set(1))
    val e = intercept[Exception] {
      spark.sql(s"CALL $name.restore(table => 't')").collect()
    }
    assert(e.getMessage.contains("exactly one of"), e.getMessage)
  }

  test("CALL g.clone(...) procedure clones through the catalog") {
    val name = "gclone"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path",
      TestSpark.tmpDir(s"cat-$name"))
    spark.sql(s"CREATE TABLE $name.src (id INT, v STRING) USING graft")
    spark.sql(s"INSERT INTO $name.src VALUES (1, 'a'), (2, 'b')")
    val msg = spark.sql(
      s"CALL $name.clone(source => 'src', target => 'dst')")
      .collect().head.getString(0)
    assert(msg.contains("cloned 'src' to 'dst'"))
    assert(spark.sql(s"SELECT * FROM $name.dst").count() == 2)
    spark.sql(s"INSERT INTO $name.dst VALUES (3, 'c')")
    assert(spark.sql(s"SELECT * FROM $name.dst").count() == 3)
    assert(spark.sql(s"SELECT * FROM $name.src").count() == 2)
    // re-cloning onto an existing table fails loudly
    val e = intercept[Exception] {
      spark.sql(s"CALL $name.clone(source => 'src', target => 'dst')")
        .collect()
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }
}
