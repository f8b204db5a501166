package graft

import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** The offline object-store emulation, end to end: the sink's whole
  * commit protocol running against (a) a coordinator whose ONLY
  * primitive is an atomic conditional PUT ([[TestCoordinators.condPut]]
  * — the S3 `If-None-Match: *` / GCS `ifGenerationMatch=0` shape), and
  * (b) a filesystem whose LISTING of the protocol's metadata
  * directories trails PUTs ([[LagListFileSystem]] — the
  * eventual-LIST-consistency shape). Together these are the two
  * properties that historically break naive commit protocols on object
  * stores; this spec converts the CommitCoordinator Scaladoc's prose
  * mapping into a tested contract. The cross-process forms of the same
  * claims run in MultiJvmRaceSpec/SoakSpec (GRAFT_TEST_COORD=condput).
  */
class ObjectStoreEmulationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def condSink(base: String, cpInterval: Int = 10) =
    new VersionedParquetSink(base, checkpointInterval = cpInterval,
      coordinator = TestCoordinators.condPut)

  test("conditional-PUT primitive: absence CAS, one winner under " +
      "32 concurrent claimants, loser bodies never land") {
    val dir = TestSpark.tmpDir("osemu_cas")
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val target = new Path(dir, "v0.commit")
    val winners = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val start = new CountDownLatch(1)
    val threads = (0 until 32).map { i =>
      new Thread(() => {
        start.await()
        if (TestCoordinators.condPut.publishIfAbsent(f, target,
          s"body-$i".getBytes("UTF-8"))) { winners.add(i); () }
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join())
    assert(winners.size == 1, s"winners: $winners")
    val in = f.open(target)
    val body = new Array[Byte](f.getFileStatus(target).getLen.toInt)
    try in.readFully(body) finally in.close()
    assert(new String(body, "UTF-8") == s"body-${winners.peek()}",
      "a loser's body replaced the winner's")
    // the emulated service's staging leaves no uploads behind
    val stage = java.nio.file.Paths.get(dir, ".osstage")
    val leftover = Option(stage.toFile.listFiles).toSeq.flatten
    assert(leftover.isEmpty, s"staged uploads leaked: ${leftover.toSeq}")
  }

  test("sink end-to-end on conditional PUT only: appends, keyed dedup, " +
      "multi-table txn, clone, compact, retention — no rename-claim " +
      "artifacts anywhere") {
    val base = TestSpark.tmpDir("osemu_sink")
    val sink = condSink(base, cpInterval = 3)
    (0 until 8).foreach { b =>
      sink.append(Seq((b.toLong, s"r$b")).toDF("n", "v"), "t")
    }
    assert(sink.appendOnce(Seq((100L, "once")).toDF("n", "v"), "t", "k1"))
    assert(!sink.appendOnce(Seq((100L, "dup")).toDF("n", "v"), "t", "k1"),
      "keyed replay landed twice through the conditional-PUT claims")
    assert(sink.multiAppendOnce(Seq(
      Seq((200L, "x")).toDF("n", "v") -> "t",
      Seq((201L, "y")).toDF("n", "v") -> "u"), txnKey = "tx1"))
    assert(!sink.multiAppendOnce(Seq(
      Seq((200L, "x")).toDF("n", "v") -> "t",
      Seq((201L, "y")).toDF("n", "v") -> "u"), txnKey = "tx1"))
    sink.cloneShallow(spark, "t", "t2")
    sink.compact(spark, "t")
    sink.setProperties(spark, "t", Map(
      "graft.logRetentionDuration" -> "0s"))
    sink.vacuum(spark, "t", graceMs = 3600000L)
    assert(sink.read(spark, "t").count() == 10L)
    assert(sink.read(spark, "t2").count() == 10L)
    assert(sink.read(spark, "u").count() == 1L)
    // time travel below the compaction still resolves
    assert(sink.readAt(spark, "t", 0L).count() == 1L)
    // no `.tmp-*` (the rename coordinator's temp naming) ever appeared
    // in any metadata dir: every claim was a PUT
    Seq(s"$base/t/_commits", s"$base/u/_commits", s"$base/t2/_commits",
      s"$base/_txn").foreach { d =>
      val names = Option(new java.io.File(d).listFiles)
        .toSeq.flatten.map(_.getName)
      assert(!names.exists(_.startsWith(".tmp-")),
        s"rename-claim artifact in $d: $names")
    }
  }

  test("LIST lag on _commits/_txn: concurrent keyed appends stay " +
      "exactly-once and the claim loop terminates via the point-read " +
      "guard; no rename ever lands a claim") {
    LagListFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val local = TestSpark.tmpDir("osemu_lag")
    val base = "lag:" + local
    LagListFileSystem.renames.clear()
    LagListFileSystem.lagMs.set(250L)
    try {
      // checkpointInterval 3 exercises maybeCheckpoint's self-splice:
      // under lag the checkpointer's own commit is never in its listing
      val sink = condSink(base, cpInterval = 3)
      val writers = 3
      val batches = 4
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to writers).map { w =>
        new Thread(() => {
          try (1 to batches).foreach { b =>
            sink.appendOnce(
              (0 until 5).map(i => (w, b, i)).toDF("w", "b", "i"),
              "t", s"w$w-b$b")
            ()
          } catch { case t: Throwable => errs.add(t); () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"writer failed under LIST lag: ${errs.peek()}")
      // let the lag window pass so the final read sees everything
      Thread.sleep(400L)
      val t = sink.read(spark, "t")
      assert(t.count() == (writers * batches * 5).toLong,
        "lost or duplicated appends under LIST lag")
      assert(t.groupBy("w", "b").agg(count(lit(1)).as("n"))
        .filter(col("n") =!= 5).count() == 0L,
        "a keyed batch applied more than once under LIST lag")
      val vs = sink.versions(spark, "t")
      assert(vs == vs.sorted && vs.size == writers * batches,
        s"version chain incoherent under LIST lag: $vs")
      // checkpoints were written (the self-splice path) and none of
      // them hides a commit: full history remains readable
      val cps = Option(new java.io.File(s"$local/t/_commits").listFiles)
        .toSeq.flatten.map(_.getName).filter(_.endsWith(".checkpoint"))
      assert(cps.nonEmpty,
        "no checkpoint written under lag — the self-splice path is dead")
      // the no-rename-for-claim contract: every recorded rename into a
      // metadata dir is a checkpoint (loss-tolerant), never a marker or
      // txn manifest
      val it = LagListFileSystem.renames.iterator()
      while (it.hasNext) {
        val dst = it.next()
        val inMeta = dst.contains("/_commits/") || dst.contains("/_txn/")
        assert(!(inMeta &&
          (dst.endsWith(".commit") || dst.endsWith(".json"))),
          s"a claim was landed by RENAME under the object-store " +
            s"emulation: $dst")
      }
    } finally {
      LagListFileSystem.lagMs.set(0L)
    }
  }

  test("retention-vs-list-lag guard: vacuumLog refuses a retention " +
      "below the declared store LIST lag, before the silent-loss " +
      "window can open") {
    val base = TestSpark.tmpDir("osemu_guard")
    val sink = condSink(base, cpInterval = 2)
    (0 until 5).foreach { b =>
      sink.append(Seq((b.toLong, "x")).toDF("n", "v"), "t")
    }
    sink.setProperties(spark, "t", Map(
      "graft.store.maxListLag" -> "10m",
      "graft.logRetentionDuration" -> "1m"))
    // a direct call below the bound refuses...
    val ex = intercept[IllegalArgumentException](
      sink.vacuumLog(spark, "t", 60000L))
    assert(ex.getMessage.contains("maxListLag"), ex.getMessage)
    // ...and the vacuum maintenance pass (which honors the
    // logRetentionDuration TBLPROPERTIES) propagates the refusal —
    // a mis-set retention must not silently disarm the phantom guard
    intercept[IllegalArgumentException](
      sink.vacuum(spark, "t", graceMs = 0L))
    // retention at the bound is accepted (nothing old enough to die
    // here; the point is the guard does not fire)
    assert(sink.vacuumLog(spark, "t", 600000L) == 0)
    // the session-conf fallback covers tables that never declared the
    // property (store-level deployment config)
    val sink2 = condSink(TestSpark.tmpDir("osemu_guard2"))
    sink2.append(Seq((1L, "x")).toDF("n", "v"), "t")
    spark.conf.set("spark.graft.store.maxListLag", "5m")
    try intercept[IllegalArgumentException](
      sink2.vacuumLog(spark, "t", 0L))
    finally spark.conf.unset("spark.graft.store.maxListLag")
  }

  test("READ paths under LIST lag: snapshot reads, time travel, " +
      "format(\"graft\") scans, CDF, and DV-masked reads are " +
      "prefix-consistent — stale at worst, never torn") {
    LagListFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val local = TestSpark.tmpDir("osemu_readlag")
    val base = "lag:" + local
    LagListFileSystem.lagMs.set(300L)
    try {
      val sink = condSink(base, cpInterval = 3)
      (0 until 6).foreach { b =>
        sink.append((0 until 10).map(i => (b, i)).toDF("b", "i"), "t")
      }
      // merge-on-read DV: masks batch 2's even rows (5 of its 10)
      sink.deleteVectored(spark, "t",
        col("b") === 2 && col("i") % 2 === 0)
      // Immediately, inside the lag window: every read must reflect a
      // PREFIX of the commit chain (lag is mtime-monotone and claims
      // are listing-gated, so a visible version implies every older
      // one) — complete batches only, never a torn batch, and the DV
      // either fully applies or not at all.
      def assertPrefix(rows: Seq[(Int, Long)], what: String): Unit = {
        val m = rows.toMap
        val bs = m.keys.toSeq.sorted
        assert(bs == (0 until bs.size), s"$what: non-prefix batches $bs")
        bs.foreach { b =>
          assert(m(b) == 10L || (b == 2 && m(b) == 5L),
            s"$what: torn batch $b (${m(b)} rows)")
        }
      }
      assertPrefix(sink.read(spark, "t").groupBy("b").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq,
        "sink.read")
      assertPrefix(spark.read.format("graft").load(s"$base/t")
        .groupBy("b").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq,
        "format(graft)")
      // version chain visible under lag is a clean prefix, and time
      // travel inside it resolves exactly
      val vs = sink.versions(spark, "t")
      assert(vs == (0L until vs.size.toLong), s"non-prefix chain: $vs")
      assert(vs.nonEmpty, "no version visible despite monotone lag")
      if (vs.size >= 2)
        assert(sink.readAt(spark, "t", 1L).count() == 20L)
      // CDF over the visible range: appends report complete batches
      val cdfTo = math.min(vs.last, 5L)
      if (cdfTo >= 1L) {
        val ins = sink.changesBetween(spark, "t", 0L, cdfTo)
          .filter(col("_change_type") === "insert")
        assert(ins.count() == 10L * cdfTo, "torn CDF range under lag")
      }
      // past the lag window: the full chain, DV applied
      Thread.sleep(500L)
      assert(sink.read(spark, "t").count() == 55L)
      assert(sink.read(spark, "t")
        .filter(col("b") === 2 && col("i") % 2 === 0).count() == 0L,
        "DV mask not applied after lag window")
      assert(sink.readAt(spark, "t", 2L).count() == 30L)
      assert(sink.changesBetween(spark, "t", 0L, 5L)
        .filter(col("_change_type") === "insert").count() == 50L)
    } finally {
      LagListFileSystem.lagMs.set(0L)
    }
  }
}
