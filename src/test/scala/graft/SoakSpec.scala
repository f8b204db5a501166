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
}
