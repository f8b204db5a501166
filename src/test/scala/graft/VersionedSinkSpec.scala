package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Pipeline, VersionedParquetSink}

class VersionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append commits versions; read = union; readAt time-travels") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore"))
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")
    assert(sink.versions(spark, "t") == Seq(0L, 1L))
    assert(sink.read(spark, "t").count() == 3)
    assert(sink.readAt(spark, "t", 0).collect().map(_.getInt(0)).toSet == Set(1, 2))
    assert(sink.readAt(spark, "t", 1).count() == 3)
  }

  test("uncommitted data directory is invisible to readers") {
    val base = TestSpark.tmpDir("vstore2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    // simulate a writer that died after writing data, before the marker
    Seq((99, "zz")).toDF("id", "v")
      .write.parquet(s"$base/t/d-orphan-died-uncommitted")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1))
    // next successful append must not collide with the orphan dir
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("appendOnce is idempotent per commit key (replayed micro-batch)") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore5"))
    assert(sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0"))
    assert(!sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0")) // replay
    assert(sink.appendOnce(Seq((2, "b")).toDF("id", "v"), "t", "batch-1"))
    assert(sink.read(spark, "t").count() == 2) // no duplicate from the replay
    assert(sink.versions(spark, "t") == Seq(0L, 1L))
  }

  test("streaming fan-out on versioned sink: batch replays can't double-append") {
    val feeds = TestSpark.tmpDir("vsfeeds")
    java.nio.file.Files.write(java.nio.file.Paths.get(feeds, "b.json"),
      """{"title":"Mayor Ann Bell resigns","published":"Mon, 05 Feb 2024 10:30:00 GMT","description":"d","link":"l","guid":"g1","media_thumbnail":null,"feed":"Politics"}"""
        .getBytes("UTF-8"))
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore6"))
    val ckpt = TestSpark.tmpDir("vsckpt")
    graft.streaming.StreamingPipeline.stream(spark, feeds, sink, ckpt)
      .awaitTermination()
    assert(sink.read(spark, "raw").count() == 1)
    // simulate the crash-window replay: re-running batch 0's writes
    val replayed = sink.appendOnce(
      sink.read(spark, "raw"), "raw", "batch-0")
    assert(!replayed)
    assert(sink.read(spark, "raw").count() == 1)
  }

  test("overwrite is a logged rewrite: content replaced, history kept") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore3"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    sink.overwrite(Seq((9, "z")).toDF("id", "v"), "t")
    // the overwrite is version 1, superseding version 0 — not a wipe
    assert(sink.versions(spark, "t") == Seq(0L, 1L))
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(9))
    // time travel below the overwrite still resolves
    assert(sink.readAt(spark, "t", 0).collect().map(_.getInt(0)).toSet
      == Set(1))
    assert(sink.history(spark, "t").head().getString(2) == "OVERWRITE")
  }

  test("overwrite replaces the schema and keeps governance") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore3b"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    // schema replacement: new column set, old versions keep theirs
    sink.overwrite(Seq((5L, 2.5)).toDF("k", "x"), "t")
    assert(sink.read(spark, "t").columns.toSeq == Seq("k", "x"))
    assert(sink.readAt(spark, "t", 0).columns.toSeq == Seq("id", "v"))
    // CHECK constraints still guard the overwrite's own write
    sink.addConstraint(spark, "t", "k_pos", "k > 0")
    intercept[Exception] {
      sink.overwrite(Seq((-3L, 1.0)).toDF("k", "x"), "t")
    }
    sink.overwrite(Seq((7L, 1.0)).toDF("k", "x"), "t")
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet
      == Set(7L))
  }

  test("checkpointing: reads stay correct across the checkpoint boundary") {
    val base = TestSpark.tmpDir("vcp1")
    val sink = new VersionedParquetSink(base, checkpointInterval = 3)
    (0 until 8).foreach(i => sink.append(Seq((i, s"v$i")).toDF("id", "v"), "t"))
    val cps = new java.io.File(s"$base/t/_commits").list()
      .filter(_.endsWith(".checkpoint"))
    assert(cps.nonEmpty, "expected at least one checkpoint after 8 commits at interval 3")
    assert(sink.versions(spark, "t") == (0L until 8L))
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == (0 until 8).toSet)
    // time travel across the boundary: versions folded into the
    // checkpoint AND the marker tail both resolve
    assert(sink.readAt(spark, "t", 1).collect().map(_.getInt(0)).toSet == Set(0, 1))
    assert(sink.readAt(spark, "t", 6).count() == 7)
  }

  test("checkpointing: idempotency keys survive being folded into a checkpoint") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vcp2"), checkpointInterval = 2)
    assert(sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0"))
    (1 until 6).foreach(i =>
      sink.appendOnce(Seq((i, "x")).toDF("id", "v"), "t", s"batch-$i"))
    // batch-0's marker is now behind the newest checkpoint; the replay
    // must still be recognized from the checkpointed manifest
    assert(!sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0"))
    assert(sink.read(spark, "t").count() == 6)
  }

  test("append with a drifted schema fails loudly before writing") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vschema"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    val drifted = Seq((2, 3.5)).toDF("id", "score") // renamed + retyped col
    val e = intercept[IllegalArgumentException] {
      sink.append(drifted, "t")
    }
    assert(e.getMessage.contains("schema mismatch"))
    assert(sink.read(spark, "t").columns.toSeq == Seq("id", "v")) // intact
    assert(sink.read(spark, "t").count() == 1)
    // nullability differences alone must NOT reject
    sink.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(5, "e"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType, nullable = true),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType, nullable = true)))), "t")
    assert(sink.read(spark, "t").count() == 2)
  }

  test("schema evolution: opt-in column add; old versions read null; time travel") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vevolve"))
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    val evolved = Seq((3, "c", 0.5)).toDF("id", "v", "score")
    // without opt-in: still rejected
    intercept[IllegalArgumentException] { sink.append(evolved, "t") }
    // with opt-in: lands; old rows read the new column as null
    sink.append(evolved, "t", allowEvolution = true)
    val now = sink.read(spark, "t").orderBy("id").collect()
    assert(sink.read(spark, "t").columns.toSeq == Seq("id", "v", "score"))
    assert(now.map(r => r.isNullAt(2)).toSeq == Seq(true, true, false))
    // dropping or retyping a column is NOT evolution
    intercept[IllegalArgumentException] {
      sink.append(Seq((4, 1.0, 9.9)).toDF("id", "v", "score"), "t",
        allowEvolution = true) // v retyped string->double
    }
    intercept[IllegalArgumentException] {
      sink.append(Seq(Tuple1(5)).toDF("id"), "t", allowEvolution = true)
    }
    // later strict appends use the evolved schema
    sink.append(Seq((6, "f", 1.25)).toDF("id", "v", "score"), "t")
    assert(sink.read(spark, "t").count() == 4)
    // time travel BEFORE the evolution: the new column doesn't exist yet
    assert(sink.readAt(spark, "t", 0).columns.toSeq == Seq("id", "v"))
    assert(sink.readAt(spark, "t", 0).count() == 2)
    // time travel after: full evolved schema over all dirs
    assert(sink.readAt(spark, "t", 1).columns.toSeq == Seq("id", "v", "score"))
  }

  test("timestamp time travel: readAsOf picks the last commit <= ts") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vasof"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    val afterV0 = java.time.Instant.now()
    Thread.sleep(20) // commit wall-clocks must straddle the probe instant
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")
    assert(sink.readAsOf(spark, "t", afterV0).collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    assert(sink.readAsOf(spark, "t", java.time.Instant.now()).count() == 2)
    // before the first commit: loud error, not an empty frame
    intercept[IllegalArgumentException] {
      sink.readAsOf(spark, "t", afterV0.minusSeconds(3600))
    }
    // SQL surface
    val view = graft.engine.Views.registerSnapshotAt(spark, sink, "t", afterV0)
    assert(spark.sql(s"SELECT count(*) FROM $view").collect()(0).getLong(0) == 1)
  }

  test("plain parquet sink also rejects drifted appends") {
    val sink = new graft.engine.ParquetTableSink(TestSpark.tmpDir("pschema"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    val e = intercept[IllegalArgumentException] {
      sink.append(Seq(("x", 1)).toDF("v", "n"), "t")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("compact folds history into one dir; reads identical; time travel kept") {
    val base = TestSpark.tmpDir("vcompact")
    val sink = new VersionedParquetSink(base)
    (0 until 5).foreach(i => sink.append(Seq((i, s"v$i")).toDF("id", "v"), "t"))
    val before = sink.read(spark, "t").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val cv = sink.compact(spark, "t", targetFiles = Some(1))
    assert(cv == 5L)
    val after = sink.read(spark, "t")
    assert(after.collect().map(r => (r.getInt(0), r.getString(1))).toSet == before)
    // the snapshot scan reads exactly ONE data directory now
    assert(after.inputFiles.map(_.split("/t/")(1).split("/")(0)).distinct.length == 1)
    // pre-compaction time travel still resolves original dirs
    assert(sink.readAt(spark, "t", 2).collect().map(_.getInt(0)).toSet == Set(0, 1, 2))
    // appends after compaction land next to the compacted dir
    sink.append(Seq((99, "z")).toDF("id", "v"), "t")
    assert(sink.read(spark, "t").count() == 6)
    // keyed replay of a pre-compaction batch is still rejected
    assert(sink.appendOnce(Seq((7, "q")).toDF("id", "v"), "t", "k7"))
    val cv2 = sink.compact(spark, "t")
    assert(cv2 > cv)
    assert(!sink.appendOnce(Seq((7, "q")).toDF("id", "v"), "t", "k7"))
    assert(sink.read(spark, "t").count() == 7)
  }

  test("idempotency keys with quotes or empty strings still dedup exactly-once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vkeys"))
    val jsonKey = """{"batch":"7","attempt":"x"}""" // quote-bearing key
    assert(sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", jsonKey))
    assert(!sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", jsonKey))
    assert(sink.appendOnce(Seq((2, "b")).toDF("id", "v"), "t", ""))
    assert(!sink.appendOnce(Seq((2, "b")).toDF("id", "v"), "t", ""))
    assert(sink.read(spark, "t").count() == 2)
  }

  test("partitioned append with retyped DATA column fails loudly") {
    val sink = new graft.engine.ParquetTableSink(TestSpark.tmpDir("ptype"))
    sink.appendPartitioned(
      Seq((1, "x", "2024-02-01")).toDF("id", "payload", "day"), "t", Seq("day"))
    val retyped = Seq((2.5, "y", "2024-02-02")).toDF("id", "payload", "day")
    val e = intercept[IllegalArgumentException] {
      sink.appendPartitioned(retyped, "t", Seq("day")) // id INT -> DOUBLE
    }
    assert(e.getMessage.contains("schema mismatch"))
    // same shapes still append fine (partition col re-typing tolerated)
    sink.appendPartitioned(
      Seq((3, "z", "2024-02-03")).toDF("id", "payload", "day"), "t", Seq("day"))
  }

  test("vacuum deletes orphans after grace; superseded dirs only on request") {
    val base = TestSpark.tmpDir("vvac")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")
    // dead writer: data landed, marker never claimed
    Seq((99, "zz")).toDF("id", "v").write.parquet(s"$base/t/d-orphan-dead")
    // fresh orphan is protected by the grace period
    assert(sink.vacuum(spark, "t", graceMs = 3600000L) == 0)
    // past the grace period it goes; committed dirs stay
    assert(sink.vacuum(spark, "t", graceMs = 0L) == 1)
    assert(!new java.io.File(s"$base/t/d-orphan-dead").exists)
    assert(sink.read(spark, "t").count() == 2)

    // superseded pre-compaction dirs survive a default vacuum...
    sink.compact(spark, "t", targetFiles = Some(1))
    assert(sink.vacuum(spark, "t", graceMs = 0L) == 0)
    assert(sink.readAt(spark, "t", 0).count() == 1) // time travel intact
    // ...and are reclaimed with includeSuperseded (time travel truncated)
    assert(sink.vacuum(spark, "t", graceMs = 0L, includeSuperseded = true) == 2)
    assert(sink.read(spark, "t").count() == 2)
    intercept[Exception] { sink.readAt(spark, "t", 0).count() }
  }

  test("concurrent same-key appendOnce: exactly one commits (race loser cleans up)") {
    val base = TestSpark.tmpDir("vrace")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0, "seed")).toDF("id", "v"), "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val results = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            sink.appendOnce(Seq((100 + i, "dup")).toDF("id", "v"), "t", "same-key")
        })
      }.map(_.get())
      assert(results.count(identity) == 1, s"expected exactly one winner, got $results")
    } finally pool.shutdown()
    assert(sink.read(spark, "t").filter($"v" === "dup").count() == 1)
    // losers' orphan dirs must not be visible (and winners' data is)
    assert(sink.read(spark, "t").count() == 2)
  }

  test("stress: concurrent appends + compactions + vacuum keep every row") {
    val base = TestSpark.tmpDir("vstress")
    val sink = new VersionedParquetSink(base, checkpointInterval = 4)
    sink.append(Seq((0, "seed")).toDF("id", "v"), "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      // 12 keyed appends (2 writers race per key) interleaved with
      // 3 compactions and a vacuum
      val tasks =
        (0 until 12).flatMap { i =>
          Seq.fill(2)(() => sink.appendOnce(
            Seq((100 + i, s"r$i")).toDF("id", "v"), "t", s"key-$i"))
        } ++ Seq.fill(3)(() => sink.compact(spark, "t")) ++
          Seq(() => sink.vacuum(spark, "t", graceMs = 3600000L))
      scala.util.Random.javaRandomToRandom(new java.util.Random(5))
        .shuffle(tasks).map { task =>
          pool.submit(new Runnable {
            def run(): Unit =
              try { task(); () } catch { case e: Throwable => errors.add(e) }
          })
        }.foreach(_.get())
    } finally pool.shutdown()
    assert(errors.isEmpty, s"stress errors: ${errors.toArray.mkString("; ")}")
    // every keyed batch exactly once, plus the seed
    val ids = sink.read(spark, "t").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (Seq(0) ++ (100 until 112)).sorted,
      s"row set corrupted: ${ids.toSeq}")
    // keyed replay after the dust settles is still a no-op
    assert(!sink.appendOnce(Seq((100, "r0")).toDF("id", "v"), "t", "key-0"))
  }

  test("delete removes matching rows; null predicate keeps; time travel intact") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vdel"))
    sink.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), "t")
    sink.append(Seq((4, "d")).toDF("id", "v"), "t")
    // predicate is NULL for id=3: SQL DELETE keeps null-predicate rows
    val v = sink.delete(spark, "t",
      when(col("id") === 3, lit(null).cast("boolean"))
        .otherwise(col("id") % 2 === 0))
    assert(v == 2L)
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1, 3))
    // pre-delete versions still time-travel complete
    assert(sink.readAt(spark, "t", 1).count() == 4)
    // appends after the delete land on the rewritten content
    sink.append(Seq((9, "z")).toDF("id", "v"), "t")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1, 3, 9))
  }

  test("merge upserts: matched keys replaced, unmatched inserted; dup keys rejected") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vmerge"))
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    sink.merge(spark, "t", Seq((2, "B2"), (5, "e")).toDF("id", "v"), Seq("id"))
    assert(sink.read(spark, "t").collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(1 -> "a", 2 -> "B2", 5 -> "e"))
    // ambiguous updates (two rows for one key) must fail loudly
    val e = intercept[IllegalArgumentException] {
      sink.merge(spark, "t", Seq((5, "x"), (5, "y")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("duplicate"))
    // replayed keyed merge is a no-op returning the original version
    val v1 = sink.merge(spark, "t", Seq((7, "g")).toDF("id", "v"), Seq("id"),
      commitKey = Some("m-1"))
    val v2 = sink.merge(spark, "t", Seq((7, "g")).toDF("id", "v"), Seq("id"),
      commitKey = Some("m-1"))
    assert(v1 == v2 && sink.read(spark, "t").filter($"id" === 7).count() == 1)
  }

  test("changesBetween: append-only ranges read directly; rewrites diff both ways") {
    import org.apache.spark.sql.functions.col
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vcdf"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")       // v0
    sink.append(Seq((2, "b"), (3, "c")).toDF("id", "v"), "t") // v1
    // append-only range: inserts only, read straight from the dirs
    val fast = sink.changesBetween(spark, "t", 0, 1).collect()
    assert(fast.forall(_.getAs[String]("_change_type") == "insert"))
    assert(fast.map(_.getInt(0)).toSet == Set(2, 3))
    // full history from -1 = everything is an insert
    assert(sink.changesBetween(spark, "t", -1, 1).count() == 3)
    // a delete in the range forces the comparing path: 2 goes away
    sink.delete(spark, "t", col("id") === 2)              // v2
    sink.append(Seq((4, "d")).toDF("id", "v"), "t")       // v3
    val diff = sink.changesBetween(spark, "t", 1, 3).collect()
      .map(r => (r.getInt(0), r.getAs[String]("_change_type"))).toSet
    assert(diff == Set((2, "delete"), (4, "insert")), s"got $diff")
    // empty range: no changes, schema preserved
    assert(sink.changesBetween(spark, "t", 3, 3).isEmpty)
  }

  test("changesBetween: compactions in range are skipped, fast path survives") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vcdfc"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")       // v0
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")       // v1
    sink.compact(spark, "t")                              // v2 (content-preserving)
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")       // v3
    val d = sink.changesBetween(spark, "t", 0, 3)
    // inserts are exactly the range's APPENDS; the compaction contributes
    // nothing (its dir duplicates v0+v1) and must not force the diff path
    assert(d.queryExecution.optimizedPlan.toString.indexOf("Except") < 0,
      "compact-only range fell back to the exceptAll diff")
    assert(d.collect().map(r => (r.getInt(0), r.getAs[String]("_change_type")))
      .toSet == Set((2, "insert"), (3, "insert")))
  }

  test("concurrent delete+merge rewrites serialize: no lost update") {
    import org.apache.spark.sql.functions.col
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vrewrace"))
    sink.append((1 to 20).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      Seq(
        () => sink.delete(spark, "t", col("id") <= 5),
        () => sink.merge(spark, "t",
          Seq((20, "UP"), (21, "new")).toDF("id", "v"), Seq("id"))
      ).map { task =>
        pool.submit(new Runnable {
          def run(): Unit =
            try { task(); () } catch { case e: Throwable => errors.add(e) }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(errors.isEmpty, s"rewrite race errors: ${errors.toArray.mkString("; ")}")
    // BOTH effects must survive, whichever order they serialized in
    val m = sink.read(spark, "t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(!(1 to 5).exists(m.contains), s"delete lost: $m")
    assert(m.get(20).contains("UP") && m.get(21).contains("new"),
      s"merge lost: $m")
  }

  test("compact racing a schema-evolution append keeps the evolved DDL") {
    // a compaction commits the LATEST committed DDL, not its snapshot's:
    // an evolution append landing between the compaction's base and its
    // claim is non-conflicting (its dir stays scanned), but committing
    // the stale pre-evolution DDL on top of it would project the new
    // column away for every later reader. The race window is tiny, so
    // run the interleaving several times — the assertion must hold for
    // every outcome (evolution before, during, or after the compact).
    for (i <- 0 until 4) {
      val sink = new VersionedParquetSink(TestSpark.tmpDir(s"vevco$i"))
      sink.append(Seq((1, "a")).toDF("id", "v"), "t")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      try {
        Seq(
          () => sink.append(Seq((2, "b", 9L)).toDF("id", "v", "extra"), "t",
            allowEvolution = true),
          () => { sink.compact(spark, "t"); () }
        ).map { task =>
          pool.submit(new Runnable {
            def run(): Unit =
              try task() catch { case e: Throwable => errors.add(e) }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      assert(errors.isEmpty, s"race errors: ${errors.toArray.mkString("; ")}")
      val read = sink.read(spark, "t")
      assert(read.columns.contains("extra"),
        s"evolved column lost after compact race (iteration $i)")
      assert(read.filter($"id" === 2).select("extra").head().getLong(0) == 9L)
      assert(read.count() == 2)
    }
  }

  test("concurrent compact cannot resurrect a racing delete's rows") {
    import org.apache.spark.sql.functions.col
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vcompdel"))
    sink.append((1 to 50).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    sink.append((51 to 60).map(i => (i, s"v$i")).toDF("id", "v"), "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      // compactions derived from the pre-delete snapshot must abort and
      // re-derive, never commit past the delete ("last compaction wins"
      // in the reader would resurrect the deleted rows)
      Seq(
        () => { sink.compact(spark, "t"); () },
        () => { sink.delete(spark, "t", col("id") <= 10); () },
        () => { sink.compact(spark, "t"); () }
      ).map { task =>
        pool.submit(new Runnable {
          def run(): Unit =
            try task() catch { case e: Throwable => errors.add(e) }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(errors.isEmpty, s"race errors: ${errors.toArray.mkString("; ")}")
    val ids = sink.read(spark, "t").collect().map(_.getInt(0)).toSet
    assert(ids == (11 to 60).toSet, s"deleted rows resurrected or lost: $ids")
  }

  test("pipeline runs unchanged on the versioned sink (trait slot-in)") {
    val feeds = TestSpark.tmpDir("vfeeds")
    java.nio.file.Files.write(java.nio.file.Paths.get(feeds, "b.json"),
      """{"title":"Mayor Ann Bell resigns","published":"Mon, 05 Feb 2024 10:30:00 GMT","description":"d","link":"l","guid":"g1","media_thumbnail":null,"feed":"Politics"}"""
        .getBytes("UTF-8"))
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore4"))
    val r = Pipeline.run(spark, feeds, sink)
    assert(r.newArticles == 1)
    assert(sink.read(spark, "raw").count() == 1)
    assert(Pipeline.run(spark, feeds, sink).newArticles == 0) // idempotent
  }

  test("_delta_log mirror: contiguous protocol-spec JSON commits matching sink history") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DataType, StructType}
    val store = TestSpark.tmpDir("dlog")
    val sink = new VersionedParquetSink(store)
    import spark.implicits._
    sink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "t")
    sink.append(Seq((3L, "c")).toDF("id", "s"), "t")
    sink.delete(spark, "t", col("id") === 1L)
    sink.compact(spark, "t", targetFiles = Some(1))
    sink.append(Seq((4L, "d", 9L)).toDF("id", "s", "extra"), "t",
      allowEvolution = true)

    val logDir = new java.io.File(s"$store/t/_delta_log")
    val names = logDir.listFiles.map(_.getName).filter(_.endsWith(".json")).sorted
    assert(names.toSeq == (0L to 4L).map(v => f"$v%020d.json"),
      s"log not contiguous: ${names.mkString(", ")}")

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val src = scala.io.Source.fromFile(
        new java.io.File(logDir, f"$v%020d.json"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
      finally src.close()
    }

    // commit 0: protocol + metaData per the public Delta protocol
    val v0 = actions(0)
    val proto = v0.flatMap(a => Option(a.get("protocol"))).head
    assert(proto.get("minReaderVersion").asInt == 1)
    assert(proto.get("minWriterVersion").asInt == 2)
    val meta0 = v0.flatMap(a => Option(a.get("metaData"))).head
    assert(meta0.get("format").get("provider").asText == "parquet")
    assert(DataType.fromJson(meta0.get("schemaString").asText)
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("id", "s"))

    // schema evolution re-emits metaData with the SAME table id
    val meta4 = actions(4).flatMap(a => Option(a.get("metaData"))).head
    assert(meta4.get("id").asText == meta0.get("id").asText)
    assert(DataType.fromJson(meta4.get("schemaString").asText)
      .asInstanceOf[StructType].fieldNames.contains("extra"))

    // replaying add/remove reconstructs exactly the live file set, and
    // the add-level stats row counts sum to the table's row count
    val numRecords = scala.collection.mutable.Map[String, Long]()
    val live = scala.collection.mutable.Set[String]()
    (0L to 4L).foreach { v =>
      actions(v).foreach { a =>
        Option(a.get("add")).foreach { n =>
          val p = n.get("path").asText
          live += p
          assert(n.get("size").asLong > 0)
          val st = mapper.readTree(n.get("stats").asText)
          numRecords(p) = st.get("numRecords").asLong
        }
        Option(a.get("remove")).foreach(n => live -= n.get("path").asText)
      }
    }
    live.foreach(p => assert(new java.io.File(s"$store/t/$p").isFile,
      s"live file $p missing on disk"))
    val viaSink = sink.read(spark, "t")
    assert(live.toSeq.map(numRecords).sum == viaSink.count())
    val viaLog = spark.read.parquet(live.toSeq.map(p => s"$store/t/$p"): _*)
    assert(viaLog.count() == viaSink.count())

    // self-healing: a crashed writer's missing log version reappears on
    // the next commit (Delta readers need contiguous versions)
    assert(new java.io.File(logDir, f"${3L}%020d.json").delete())
    sink.append(Seq((5L, "e", 10L)).toDF("id", "s", "extra"), "t")
    val healed = logDir.listFiles.map(_.getName).filter(_.endsWith(".json")).sorted
    assert(healed.toSeq == (0L to 5L).map(v => f"$v%020d.json"),
      s"gap not healed: ${healed.mkString(", ")}")
  }

  test("_delta_log mirror: parquet checkpoint + _last_checkpoint equal JSON replay") {
    val store = TestSpark.tmpDir("dlog-ck")
    val sink = new VersionedParquetSink(store)
    import spark.implicits._
    // 13 commits crossing the interval-10 boundary, with a compaction
    // in the middle so the checkpoint carries remove tombstones too
    (0 until 6).foreach { i =>
      sink.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), "t")
    }
    sink.compact(spark, "t", targetFiles = Some(1)) // v6
    (6 until 12).foreach { i =>                     // v7..v12
      sink.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), "t")
    }

    val logDir = new java.io.File(s"$store/t/_delta_log")
    val ck = new java.io.File(logDir, f"${10L}%020d.checkpoint.parquet")
    assert(ck.isFile, "checkpoint file missing at version 10")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lc = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(logDir, "_last_checkpoint").toPath), "UTF-8"))
    assert(lc.get("version").asLong == 10L)

    val ckDf = spark.read.parquet(ck.getAbsolutePath)
    assert(ckDf.count() == lc.get("size").asLong,
      "_last_checkpoint size must equal the checkpoint's action count")

    // replay the JSON commits 0..10 and diff against the checkpoint
    def actions(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val src = scala.io.Source.fromFile(
        new java.io.File(logDir, f"$v%020d.json"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
      finally src.close()
    }
    val liveJson = scala.collection.mutable.Map[String, String]() // path -> stats
    var lastMetaSchema: String = null
    var maxWriter = 0
    (0L to 10L).foreach { v =>
      actions(v).foreach { a =>
        Option(a.get("add")).foreach(n =>
          liveJson(n.get("path").asText) = n.get("stats").asText)
        Option(a.get("remove")).foreach(n => liveJson -= n.get("path").asText)
        Option(a.get("metaData")).foreach(n =>
          lastMetaSchema = n.get("schemaString").asText)
        Option(a.get("protocol")).foreach(n =>
          maxWriter = math.max(maxWriter, n.get("minWriterVersion").asInt))
      }
    }
    val ckAdds = ckDf.filter("add IS NOT NULL")
      .selectExpr("add.path", "add.stats", "add.dataChange").collect()
    assert(ckAdds.map(_.getString(0)).toSet == liveJson.keySet,
      "checkpoint add set != JSON-replay live set at v10")
    ckAdds.foreach { r =>
      assert(r.getString(1) == liveJson(r.getString(0)),
        s"stats drifted for ${r.getString(0)}")
      assert(!r.getBoolean(2), "checkpoint adds must carry dataChange=false")
    }
    val ckMeta = ckDf.filter("metaData IS NOT NULL")
      .selectExpr("metaData.schemaString", "metaData.id").collect()
    assert(ckMeta.length == 1)
    assert(ckMeta.head.getString(0) == lastMetaSchema,
      "checkpoint metaData schema != last JSON metaData at v10")
    val ckProto = ckDf.filter("protocol IS NOT NULL")
      .selectExpr("protocol.minWriterVersion").collect()
    assert(ckProto.length == 1 && ckProto.head.getInt(0) == maxWriter)
    // tombstones: the compaction's superseded files are on disk and
    // present as removes (vacuum coordination)
    val ckRemoves = ckDf.filter("remove IS NOT NULL")
      .selectExpr("remove.path").collect().map(_.getString(0))
    assert(ckRemoves.nonEmpty, "compaction tombstones missing")
    ckRemoves.foreach(p => assert(new java.io.File(s"$store/t/$p").isFile))
    assert(ckRemoves.toSet.intersect(ckAdds.map(_.getString(0)).toSet).isEmpty,
      "a file cannot be both live and tombstoned")
    // scanning only the checkpoint's live adds reproduces the v10 table
    val viaCk = spark.read.parquet(
      ckAdds.map(r => s"$store/t/${r.getString(0)}").toIndexedSeq: _*)
    assert(viaCk.count() == sink.readAt(spark, "t", 10L).count())
  }
}
