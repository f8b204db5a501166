package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CommitCoordinator, RenameCommitCoordinator, VersionedParquetSink}

/** The pluggable commit-coordination seam ([[graft.engine.CommitCoordinator]]):
  * every claim the sink makes — version markers, the multi-table txn
  * manifest, clone markers — must flow through the configured
  * coordinator, so an object-store deployment can swap the local
  * atomic-rename for a conditional PUT without touching the protocol.
  * The cross-process races in MultiJvmRaceSpec pin the DEFAULT
  * implementation's atomicity; this spec pins the seam. */
class CommitCoordinatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Delegates to the default coordinator, recording every target. */
  private final class Recording extends CommitCoordinator {
    val targets = new ConcurrentLinkedQueue[String]()
    override def publishIfAbsent(f: FileSystem, target: Path,
        body: Array[Byte]): Boolean = {
      targets.add(target.getName)
      RenameCommitCoordinator.publishIfAbsent(f, target, body)
    }
    def names: Seq[String] = {
      val it = targets.iterator(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  test("every claim flows through the coordinator; keyed replays " +
      "short-circuit BEFORE it") {
    val co = new Recording
    val sink = new VersionedParquetSink(TestSpark.tmpDir("coord"),
      coordinator = co)
    sink.append(Seq((1L, "a")).toDF("n", "v"), "t")
    assert(co.names == Seq("0.commit"),
      s"append must claim exactly the v0 marker, saw ${co.names}")

    assert(sink.appendOnce(Seq((2L, "b")).toDF("n", "v"), "t", "k1"))
    assert(co.names == Seq("0.commit", "1.commit"))
    // a keyed replay is deduped from the manifest — no claim attempted
    assert(!sink.appendOnce(Seq((2L, "b")).toDF("n", "v"), "t", "k1"))
    assert(co.names == Seq("0.commit", "1.commit"),
      "a keyed replay must not reach the coordinator")

    // a multi-table txn claims its manifest first, then one marker per
    // table — the ordering the crash-recovery protocol relies on
    assert(sink.multiAppendOnce(Seq(
      Seq((3L, "c")).toDF("n", "v") -> "t",
      Seq((4L, "d")).toDF("n", "v") -> "u"), txnKey = "tx1"))
    val after = co.names
    assert(after.count(_.endsWith(".json")) == 1,
      s"txn manifest must be claimed exactly once: $after")
    // the txn's three claims come last: manifest first (the commit
    // point), then one marker per table
    assert(after.takeRight(3).head.endsWith(".json") &&
      after.takeRight(2).forall(_.endsWith(".commit")),
      s"txn manifest must be claimed before per-table markers: $after")
    assert(sink.read(spark, "t").count() == 3)
    assert(sink.read(spark, "u").count() == 1)
  }

  test("concurrent appends through one coordinator: all land, " +
      "distinct versions, claims >= commits") {
    val co = new Recording
    val sink = new VersionedParquetSink(TestSpark.tmpDir("coord2"),
      coordinator = co)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        sink.appendOnce(Seq((i.toLong, s"w$i")).toDF("n", "v"), "t", s"key$i")
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val ns = sink.read(spark, "t").collect().map(_.getLong(0)).sorted.toSeq
    assert(ns == Seq(1L, 2L, 3L, 4L))
    val versions = sink.versions(spark, "t")
    assert(versions == Seq(0L, 1L, 2L, 3L))
    // every committed version was claimed through the seam (losers may
    // add extra attempts, never fewer)
    assert(Seq("0.commit", "1.commit", "2.commit", "3.commit")
      .forall(co.names.contains), s"claims missing: ${co.names}")
  }

  test("default coordinator: 32 concurrent claimants on one target — " +
      "exactly one winner, winner's body at the target") {
    // direct hammer on the primitive (no sink, no in-JVM claim lock in
    // front of it): the hard-link claim must admit exactly one winner,
    // and the losers' bodies must never replace the winner's — the
    // property plain POSIX rename (which REPLACES) cannot give
    val dir = TestSpark.tmpDir("coord4")
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val target = new Path(dir, "v0.commit")
    val winners = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 32).map { i =>
      new Thread(() => {
        start.await()
        if (RenameCommitCoordinator.publishIfAbsent(f, target,
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
    val litter = f.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(litter.isEmpty, s"temp litter: ${litter.toSeq}")
  }

  test("default coordinator: absence CAS semantics on one target") {
    val f = new Path(TestSpark.tmpDir("coord3"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(TestSpark.tmpDir("coord3"), "x.commit")
    assert(RenameCommitCoordinator.publishIfAbsent(f, target,
      "first".getBytes("UTF-8")))
    // the loser's body never replaces the winner's
    assert(!RenameCommitCoordinator.publishIfAbsent(f, target,
      "second".getBytes("UTF-8")))
    val in = f.open(target)
    val buf = new Array[Byte](5)
    try in.readFully(buf) finally in.close()
    assert(new String(buf, "UTF-8") == "first")
    // and no temp litter survives either call
    val left = f.listStatus(target.getParent)
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(left.isEmpty, s"temp litter: ${left.toSeq}")
  }
}
