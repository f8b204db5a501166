package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Mixed-workload soak: concurrent appenders, a compactor, a vacuumer,
  * and a reader all hammer one table with the full operational layer
  * enabled (identity + bloom + auto-compact + optimizeWrite). The
  * pairwise races have their own specs; this pins the COMPOSITION —
  * every committed row survives exactly once, identity values never
  * collide, and no reader ever observes a torn snapshot. */
class SoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appends x compaction x vacuum x reads: invariants hold throughout") {
    val base = TestSpark.tmpDir("soak1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("n", "v"), "t")
    sink.setProperties(spark, "t", Map(
      "graft.bloom.columns" -> "n",
      "graft.autoCompact.minDirs" -> "6",
      "graft.optimizeWrite" -> "true"))
    sink.setIdentityColumn(spark, "t", "id")

    val appenders = 2
    val batches = 8
    val rows = 25
    val pool = Executors.newFixedThreadPool(appenders + 3)
    val go = new CountDownLatch(1)
    val done = new CountDownLatch(appenders)
    val firstFailure = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Runnable = new Runnable {
      override def run(): Unit = {
        go.await()
        try body
        catch { case t: Throwable => firstFailure.compareAndSet(null, t) }
      }
    }

    (0 until appenders).foreach { a =>
      pool.submit(guard {
        try (0 until batches).foreach { b =>
          sink.append((0 until rows).map(i =>
            ((a * batches + b).toLong * rows + i, s"w$a-$b-$i"))
            .toDF("n", "v").repartition(4), "t")
        } finally done.countDown()
      })
    }
    pool.submit(guard {
      while (done.getCount > 0) {
        try { sink.compact(spark, "t", targetFiles = Some(2)); () }
        catch { case _: IllegalStateException => () } // lost-race livelock guard
        Thread.sleep(150)
      }
    })
    pool.submit(guard {
      while (done.getCount > 0) {
        sink.vacuum(spark, "t", graceMs = 3600000L) // young-dir-safe
        Thread.sleep(200)
      }
    })
    pool.submit(guard {
      while (done.getCount > 0) {
        // every observed snapshot is internally consistent: identity
        // values unique within it, never more rows than ids
        val snap = sink.read(spark, "t")
          .select("id").collect().flatMap(r => Option(r.get(0)))
        assert(snap.distinct.length == snap.length,
          s"torn snapshot: duplicate ids in a single read")
        Thread.sleep(100)
      }
    })

    go.countDown()
    assert(done.await(300, TimeUnit.SECONDS), "appenders did not finish")
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    Option(firstFailure.get()).foreach(t => fail(t))

    val fin = sink.read(spark, "t").collect()
    val ns = fin.map(_.getLong(0)).sorted.toSeq
    val expected = (0L +: (0 until appenders).flatMap(a =>
      (0 until batches).flatMap(b => (0 until rows).map(i =>
        (a * batches + b).toLong * rows + i))).sorted).sorted
    assert(ns == expected, s"lost/duplicated rows: ${ns.length} of " +
      s"${expected.length}")
    val ids = fin.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Long]))
    assert(ids.length == appenders * batches * rows,
      "identity allocation missing rows")
    assert(ids.distinct.length == ids.length, "identity collision")
    // the table still reads through the planner path and time travel
    assert(spark.read.format("graft").load(s"$base/t").count() ==
      expected.length.toLong)
    assert(sink.readAt(spark, "t", 0).count() == 1L)
  }

  test("log retention x checkpoints x clones x vacuum: hundreds of " +
      "versions under concurrent churn") {
    // races the O(interval) commit-listing claim (vacuumLog + parquet
    // checkpoints) against live appenders, a cloner pinning snapshots
    // mid-flight, and time-travel readers — the marker set is
    // CONTINUOUSLY retiring while every other actor depends on the
    // manifest being complete for its snapshot
    retentionSoak(TestSpark.tmpDir("soak2"),
      b => new VersionedParquetSink(b, checkpointInterval = 5))
  }

  test("log retention soak through the conditional-PUT coordinator: " +
      "the object-store mapping survives the same churn") {
    // identical churn, every claim now an emulated conditional PUT
    // (TestCoordinators.condPut) — the soak that caught the r9
    // phantom-commit data loss, re-run against the put-if-absent-only
    // primitive the S3/GCS/Azure mapping supplies
    retentionSoak(TestSpark.tmpDir("soak2cp"),
      b => new VersionedParquetSink(b, checkpointInterval = 5,
        coordinator = TestCoordinators.condPut))
  }

  private def retentionSoak(base: String,
      mkSink: String => VersionedParquetSink): Unit = {
    val sink = mkSink(base)
    sink.append(Seq((0L, "seed")).toDF("n", "v"), "t")
    sink.setProperties(spark, "t", Map(
      "graft.logRetentionDuration" -> "0s", // retire aggressively
      "graft.deletedFileRetentionDuration" -> "1h")) // data dirs safe

    val appenders = 2
    val batches = 40
    val rows = 5
    val pool = Executors.newFixedThreadPool(appenders + 3)
    val go = new CountDownLatch(1)
    val done = new CountDownLatch(appenders)
    val firstFailure = new AtomicReference[Throwable](null)
    val clones = new java.util.concurrent.atomic.AtomicInteger(0)
    def guard(body: => Unit): Runnable = new Runnable {
      override def run(): Unit = {
        go.await()
        try body
        catch { case t: Throwable => firstFailure.compareAndSet(null, t) }
      }
    }

    (0 until appenders).foreach { a =>
      pool.submit(guard {
        try (0 until batches).foreach { b =>
          sink.append(
            (0 until rows).map(i =>
              ((a * batches + b).toLong * rows + i, s"w$a-$b-$i"))
              .toDF("n", "v"), "t")
        } finally done.countDown()
      })
    }
    pool.submit(guard { // vacuum (runs vacuumLog via the retention prop)
      while (done.getCount > 0) {
        sink.vacuum(spark, "t", graceMs = 3600000L)
        Thread.sleep(120)
      }
    })
    pool.submit(guard { // cloner: pin a snapshot mid-churn, read it back
      while (done.getCount > 0) {
        val i = clones.getAndIncrement()
        val v = sink.cloneShallow(spark, "t", s"c$i")
        val cnt = sink.read(spark, s"c$i").count()
        assert(cnt >= 1L, s"clone c$i at v$v read $cnt rows")
        Thread.sleep(300)
      }
    })
    pool.submit(guard { // reader: versions() stays coherent; time travel
      while (done.getCount > 0) {
        val vs = sink.versions(spark, "t")
        assert(vs.nonEmpty && vs == vs.sorted,
          s"versions() incoherent under log retention: $vs")
        // the latest version must stay fully readable mid-retirement
        assert(sink.readAt(spark, "t", vs.last).count() >= 1L)
        Thread.sleep(150)
      }
    })

    go.countDown()
    assert(done.await(300, TimeUnit.SECONDS), "appenders did not finish")
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    Option(firstFailure.get()).foreach(t => fail(t))

    // hundreds of versions actually happened, and retention actually
    // retired markers (the commit dir holds far fewer than one marker
    // per version)
    val nVersions = sink.versions(spark, "t").last + 1
    assert(nVersions >= (appenders * batches).toLong,
      s"expected 80+ versions, saw $nVersions")
    val markerFiles = Option(new java.io.File(s"$base/t/_commits")
        .listFiles).toSeq.flatten.count(_.getName.endsWith(".commit"))
    assert(markerFiles < (appenders * batches) / 2,
      s"log retention retired nothing: $markerFiles markers for " +
        s"$nVersions versions")

    // every committed row survives exactly once
    val fin = sink.read(spark, "t").collect()
    val ns = fin.map(_.getLong(0)).sorted.toSeq
    val expected = (0L +: (0 until appenders).flatMap(a =>
      (0 until batches).flatMap(b => (0 until rows).map(i =>
        (a * batches + b).toLong * rows + i))).sorted).sorted
    assert(ns == expected,
      s"lost/duplicated rows: ${ns.length} of ${expected.length}")
    // every clone still reads its pinned snapshot after the churn
    (0 until clones.get()).foreach { i =>
      assert(sink.read(spark, s"c$i").count() >= 1L, s"clone c$i broken")
    }
  }

  test("chunk-store soak: concurrent ingest x replays x vacuum, " +
      "lossless reassembly") {
    // races ChunkIndex's two-table keyed commit protocol: appenders
    // whose batches SHARE content (the duplicate-store-row window),
    // a replayer re-submitting already-committed batch keys, and a
    // vacuumer running log retention underneath. The invariant is the
    // one users rely on: every ingested document reassembles to its
    // exact original text afterwards, replays add nothing.
    val base = TestSpark.tmpDir("soak3")
    val sink = new VersionedParquetSink(base, checkpointInterval = 5)

    def salad(seed: Int, n: Int): String = {
      val vocab = Vector("red", "blue", "green", "gold", "iron", "wolf",
        "moon", "star", "rain", "leaf", "sand", "snow", "fire", "dust")
      val rnd = new scala.util.Random(seed)
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val sharedRun = salad(999, 120) // content EVERY appender ingests
    val appenders = 2
    val batchesPer = 6
    def docId(a: Int, b: Int) = (a * batchesPer + b).toLong
    def docText(a: Int, b: Int) =
      s"${salad(a * 100 + b, 80)} $sharedRun ${salad(a * 100 + b + 50, 40)}"

    val pool = Executors.newFixedThreadPool(appenders + 2)
    val go = new CountDownLatch(1)
    val done = new CountDownLatch(appenders)
    val firstFailure = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Runnable = new Runnable {
      override def run(): Unit = {
        go.await()
        try body
        catch { case t: Throwable => firstFailure.compareAndSet(null, t) }
      }
    }
    (0 until appenders).foreach { a =>
      pool.submit(guard {
        try (0 until batchesPer).foreach { b =>
          graft.engine.ChunkIndex.append(spark, sink,
            Seq((docId(a, b), docText(a, b))).toDF("doc_id", "text"),
            batchKey = Some(s"soak-$a-$b"))
        } finally done.countDown()
      })
    }
    pool.submit(guard { // replayer: re-submit keys that already landed
      while (done.getCount > 0) {
        graft.engine.ChunkIndex.append(spark, sink,
          Seq((docId(0, 0), docText(0, 0))).toDF("doc_id", "text"),
          batchKey = Some("soak-0-0"))
        Thread.sleep(150)
      }
    })
    pool.submit(guard { // vacuum + retention churn under the ingest
      while (done.getCount > 0) {
        try {
          sink.vacuum(spark, "cdc_store", graceMs = 3600000L)
          sink.vacuum(spark, "cdc_manifest", graceMs = 3600000L)
        } catch { case _: Exception => () } // tables may not exist yet
        Thread.sleep(200)
      }
    })

    go.countDown()
    assert(done.await(300, TimeUnit.SECONDS), "appenders did not finish")
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    Option(firstFailure.get()).foreach(t => fail(t))

    // 1. lossless reassembly for EVERY ingested doc, replays absorbed
    val back = graft.engine.ChunkIndex.reassemble(spark, sink)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (a <- 0 until appenders; b <- 0 until batchesPer) {
      assert(back.get(docId(a, b)).contains(docText(a, b)),
        s"doc ${docId(a, b)} lost or corrupted")
    }
    assert(back.size == appenders * batchesPer, s"extra docs: ${back.size}")
    // 2. the shared run actually deduplicated across appenders: the
    //    store holds fewer DISTINCT addresses than total manifest rows
    val distinctAddrs = sink.read(spark, "cdc_store")
      .select("hash").distinct().count()
    val manifestRows = sink.read(spark, "cdc_manifest").count()
    assert(distinctAddrs < manifestRows,
      s"no cross-appender sharing: $distinctAddrs of $manifestRows")
    // 3. each manifest (doc, chunk) landed exactly once despite replays
    val dupManifest = sink.read(spark, "cdc_manifest")
      .groupBy("doc_id", "chunk").count().filter("count > 1").count()
    assert(dupManifest == 0L, s"$dupManifest duplicated manifest rows")
  }
}
